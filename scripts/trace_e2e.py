"""Capture a jax.profiler trace of the fused study-E2E pipeline step
(loc -> crop -> grade, 8 studies) and print the device-op breakdown.

Usage: python scripts/trace_e2e.py [horizontal|rotated]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _trace_utils import load_device_ops, print_top_ops

import jax
import jax.numpy as jnp
import numpy as np

N_STUDIES = 8


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "horizontal"

    from spine_vision_tpu.infer import (
        StudyInferencePipeline,
        StudyInput,
        StudyPipelineConfig,
    )
    from spine_vision_tpu.models import Classifier, CoordinateRegressor

    use_pallas = jax.default_backend() == "tpu"
    loc = CoordinateRegressor(
        backbone_name="convnext_base", dtype=jnp.bfloat16, use_pallas=use_pallas
    )
    loc_vars = jax.jit(lambda r, x: loc.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    )
    cls = Classifier(backbone_name="resnet18", dtype=jnp.bfloat16)
    cls_vars = jax.jit(lambda r, x: cls.init(r, x, train=False))(
        jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    )

    config = StudyPipelineConfig(padded_hw=(768, 768), crop_mode=mode)
    pipeline = StudyInferencePipeline(loc, loc_vars, cls, cls_vars, config=config)
    rng = np.random.default_rng(0)
    studies = [
        StudyInput(
            t1_slice=rng.normal(100, 30, (640, 640)).astype(np.float32),
            t2_slice=rng.normal(90, 25, (640, 640)).astype(np.float32),
            t1_spacing=(0.3, 0.3),
            t2_spacing=(0.3, 0.3),
            study_id=f"s{i}",
        )
        for i in range(N_STUDIES)
    ]
    slices, hw, spacing = pipeline._pack(studies)
    slices_d, hw_d, spacing_d = (
        jnp.asarray(slices), jnp.asarray(hw), jnp.asarray(spacing)
    )

    def step() -> float:
        out = pipeline._run(
            pipeline.loc_variables, pipeline.cls_variables, slices_d, hw_d, spacing_d
        )
        return float(jnp.sum(out["logits"]["pfirrmann"]))

    step()  # compile + warm
    step()

    tmp = tempfile.mkdtemp(prefix="trace_e2e_")
    with jax.profiler.trace(tmp):
        step()

    by_name, count, total = load_device_ops(tmp)
    print(
        f"mode={mode} device-op total {total:.2f} ms for {N_STUDIES} studies "
        f"({total / N_STUDIES:.2f} ms/study device time)"
    )
    print_top_ops(by_name, count, top=40)
    print("trace dir:", tmp)


if __name__ == "__main__":
    main()
