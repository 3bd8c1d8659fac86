"""Verify drive: data-parallel serve loop end-to-end on the 8-device CPU mesh.

Builds a tiny two-stage pipeline with mesh sharding, writes real .mha request
volumes + JSONs, drains them through serve_directory, and checks results
match the single-device pipeline's output.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

import json
import tempfile
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from spine_vision_tpu.infer import StudyInferencePipeline, StudyPipelineConfig
from spine_vision_tpu.infer.serve import serve_directory
from spine_vision_tpu.io.types import MedicalImage
from spine_vision_tpu.io.writers import write_medical_image
from spine_vision_tpu.models import Classifier, CoordinateRegressor


def build(mesh):
    config = StudyPipelineConfig(
        loc_image_size=(64, 64), crop_size=(32, 32), padded_hw=(128, 128)
    )
    loc = CoordinateRegressor(backbone_name="resnet18", dtype=jnp.float32)
    loc_vars = loc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    cls = Classifier(backbone_name="resnet18", dtype=jnp.float32)
    cls_vars = cls.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False)
    return StudyInferencePipeline(loc, loc_vars, cls, cls_vars, config=config, mesh=mesh)


def main() -> None:
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    assert mesh.size == 8, mesh
    dp = build(mesh)
    single = build(None)

    rng = np.random.default_rng(5)
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        watch, out = tmp / "req", tmp / "out"
        watch.mkdir()
        for i in range(3):
            vol = rng.normal(100, 30, (4, 80, 80)).astype(np.float32)
            t1, t2 = tmp / f"t1_{i}.mha", tmp / f"t2_{i}.mha"
            write_medical_image(MedicalImage(array=vol, spacing=(0.45, 0.45, 3.0)), t1)
            write_medical_image(MedicalImage(array=vol + 5, spacing=(0.45, 0.45, 3.0)), t2)
            (watch / f"r{i}.json").write_text(
                json.dumps({"study_id": f"s{i}", "t1": str(t1), "t2": str(t2)})
            )
        stats = serve_directory(dp, watch, out, once=True)
        assert stats.processed == 3 and stats.failed == 0, stats

        # Re-issue the same requests through the single-device pipeline.
        from spine_vision_tpu.infer import study_input_from_paths

        studies = [
            study_input_from_paths(tmp / f"t1_{i}.mha", tmp / f"t2_{i}.mha", study_id=f"s{i}")
            for i in range(3)
        ]
        base = single.run(studies)
        for i, b in enumerate(base):
            payload = json.loads((out / f"s{i}.json").read_text())
            np.testing.assert_allclose(
                np.asarray(payload["coords"]), b.coords, rtol=1e-5, atol=1e-6
            )
            for task, pred in payload["predictions"].items():
                np.testing.assert_array_equal(np.asarray(pred), b.predictions[task])
        print("SERVE-DP VERIFY OK: 3 requests, sharded == single-device")


if __name__ == "__main__":
    main()
