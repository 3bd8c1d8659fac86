"""Train the text detector and ship weights/ocr_detector.npz; also report
the shipped recognizer's CER (the round-2 train-ocr run produced the
recognizer checkpoint; the detector stage was cut short)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    from spine_vision_tpu.models.textrec import TextRecognitionNet
    from spine_vision_tpu.train.ocr import (
        DEFAULT_WEIGHTS_DIR,
        evaluate_recognizer,
        load_variables_npz,
        train_detector,
    )

    _, recall = train_detector(
        steps=steps, output_path=DEFAULT_WEIGHTS_DIR / "ocr_detector.npz"
    )
    print(json.dumps({"detector_box_recall": recall}), flush=True)

    rec_path = DEFAULT_WEIGHTS_DIR / "ocr_recognizer.npz"
    if rec_path.exists():
        cer = evaluate_recognizer(TextRecognitionNet(), load_variables_npz(rec_path))
        print(json.dumps({"recognizer_cer": cer}), flush=True)


if __name__ == "__main__":
    main()
