"""Base configuration shared by all CLI-facing configs.

Capability parity with reference spine_vision/core/config.py:8-16 (pydantic
BaseConfig with verbose/file-log knobs). The CLI layer renders these configs
into argparse subcommands (this framework's replacement for tyro).
"""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

from pydantic import BaseModel, ConfigDict


class BaseConfig(BaseModel):
    """Base configuration with common fields.

    Attributes:
        verbose: Enable DEBUG-level logging (CLI alias ``-v``).
        enable_file_log: Also write logs to a rotating file sink.
        log_path: Directory for log files.
    """

    verbose: bool = False
    enable_file_log: bool = False
    log_path: Path = Path.cwd() / "logs"

    model_config = ConfigDict(arbitrary_types_allowed=True)

    # CLI aliases consumed by spine_vision_tpu.cli when building argparse flags.
    cli_aliases: ClassVar[dict[str, list[str]]] = {"verbose": ["-v"]}
