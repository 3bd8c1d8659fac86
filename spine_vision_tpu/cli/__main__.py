"""python -m spine_vision_tpu.cli"""

from spine_vision_tpu.cli import main

main()
