"""Fused study-inference graph: shape/parity tests on synthetic studies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.infer import (
    StudyInferencePipeline,
    StudyInput,
    StudyPipelineConfig,
)
from spine_vision_tpu.models import Classifier, CoordinateRegressor
from spine_vision_tpu.ops.geometry import (
    mm_to_pixels,
    mm_to_pixels_jax,
    rotation_angles_array,
    rotation_angles_jax,
)
from spine_vision_tpu.ops.image import bilinear_resize, resize_dynamic


def test_rotation_angles_jax_matches_host():
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = rng.uniform(0.3, 0.7, 5)
        y = np.sort(rng.uniform(0.1, 0.9, 5))
        centers = np.stack([x, y], axis=1).astype(np.float32)
        host = rotation_angles_array(centers, (413, 307), 1.3)
        traced = np.asarray(
            rotation_angles_jax(
                jnp.asarray(centers), jnp.asarray([413, 307]), 1.3
            )
        )
        np.testing.assert_allclose(traced, host, rtol=1e-4, atol=1e-3)


def test_mm_to_pixels_jax_matches_host():
    delta = (55.0, 15.0, 17.5, 20.0)
    for spacing in [(0.6875, 0.6875), (0.3, 0.5), (1.0, 1.0)]:
        host = mm_to_pixels(delta, spacing)
        traced = np.asarray(
            mm_to_pixels_jax(jnp.asarray(delta), jnp.asarray(spacing))
        )
        np.testing.assert_array_equal(traced, np.asarray(host, dtype=np.float32))


def test_resize_dynamic_matches_static_resize():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (96, 80)).astype(np.float32)
    padded = np.zeros((128, 128), dtype=np.float32)
    padded[:96, :80] = img
    out_dyn = np.asarray(
        resize_dynamic(jnp.asarray(padded), jnp.asarray([96, 80]), 64, 64)
    )
    out_static = np.asarray(bilinear_resize(jnp.asarray(img), 64, 64))
    np.testing.assert_allclose(out_dyn, out_static, rtol=1e-5, atol=1e-3)


@pytest.fixture(scope="module")
def tiny_pipeline():
    config = StudyPipelineConfig(
        loc_image_size=(64, 64),
        crop_size=(32, 32),
        padded_hw=(128, 128),
    )
    loc_model = CoordinateRegressor(
        backbone_name="resnet18", dtype=jnp.float32
    )
    loc_vars = loc_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    cls_model = Classifier(backbone_name="resnet18", dtype=jnp.float32)
    cls_vars = cls_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False
    )
    return StudyInferencePipeline(
        loc_model, loc_vars, cls_model, cls_vars, config=config
    )


def _synthetic_studies(n, rng):
    studies = []
    for i in range(n):
        h1, w1 = int(rng.integers(64, 128)), int(rng.integers(64, 128))
        h2, w2 = int(rng.integers(64, 128)), int(rng.integers(64, 128))
        studies.append(
            StudyInput(
                t1_slice=rng.normal(100, 30, (h1, w1)).astype(np.float32),
                t2_slice=rng.normal(100, 30, (h2, w2)).astype(np.float32),
                t1_spacing=(0.6, 0.6),
                t2_spacing=(0.7, 0.5),
                study_id=f"study{i}",
            )
        )
    return studies


def test_pipeline_shapes_and_decode(tiny_pipeline):
    rng = np.random.default_rng(2)
    results = tiny_pipeline.run(_synthetic_studies(2, rng))
    assert len(results) == 2
    r = results[0]
    assert r.coords.shape == (2, 5, 2)
    assert np.all(r.coords >= 0) and np.all(r.coords <= 1)
    assert r.angles.shape == (2, 5)
    assert r.crops.shape == (2, 5, 32, 32)
    assert r.crops.dtype == np.uint8
    for task_name, logit in r.logits.items():
        assert logit.shape[0] == 5, task_name
        assert r.predictions[task_name].shape[0] == 5
        probs = r.probabilities[task_name]
        assert np.all(probs >= 0) and np.all(probs <= 1)


def test_pipeline_deterministic(tiny_pipeline):
    rng = np.random.default_rng(3)
    studies = _synthetic_studies(1, rng)
    r1 = tiny_pipeline.run(studies)[0]
    r2 = tiny_pipeline.run(studies)[0]
    np.testing.assert_array_equal(r1.crops, r2.crops)
    np.testing.assert_allclose(r1.coords, r2.coords)
    for k in r1.logits:
        np.testing.assert_allclose(r1.logits[k], r2.logits[k], rtol=1e-5)


def test_pipeline_horizontal_mode_zero_angles():
    config = StudyPipelineConfig(
        loc_image_size=(64, 64),
        crop_size=(32, 32),
        padded_hw=(128, 128),
        crop_mode="horizontal",
    )
    loc_model = CoordinateRegressor(backbone_name="resnet18", dtype=jnp.float32)
    loc_vars = loc_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    cls_model = Classifier(backbone_name="resnet18", dtype=jnp.float32)
    cls_vars = cls_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False
    )
    pipe = StudyInferencePipeline(
        loc_model, loc_vars, cls_model, cls_vars, config=config
    )
    rng = np.random.default_rng(4)
    result = pipe.run(_synthetic_studies(1, rng))[0]
    np.testing.assert_array_equal(result.angles, np.zeros((2, 5)))


def test_pipeline_batch_bucketing(tiny_pipeline):
    """Serving-shape stability: different study counts inside the same
    power-of-two bucket reuse one compiled graph, and padded dummy rows
    do not perturb real results."""
    rng = np.random.default_rng(7)
    studies = _synthetic_studies(4, rng)

    before = tiny_pipeline._run._cache_size()
    r3 = tiny_pipeline.run(studies[:3])  # buckets to 4
    r4 = tiny_pipeline.run(studies)      # exactly 4
    assert len(r3) == 3 and len(r4) == 4
    for a, b in zip(r3, r4[:3]):
        np.testing.assert_array_equal(a.crops, b.crops)
        np.testing.assert_allclose(a.coords, b.coords, rtol=1e-5)
        for k in a.logits:
            np.testing.assert_allclose(a.logits[k], b.logits[k], rtol=1e-4, atol=1e-5)
    # Both calls hit the same jit cache entry (N padded to 4).
    assert tiny_pipeline._run._cache_size() == before + 1


def test_serve_directory_end_to_end(tiny_pipeline, tmp_path):
    """The batch-serving loop: request JSONs + real volume files in, result
    JSONs out, processed requests moved to done/, malformed to failed/."""
    import json

    from spine_vision_tpu.infer.serve import serve_directory
    from spine_vision_tpu.io.types import MedicalImage
    from spine_vision_tpu.io.writers import write_medical_image

    rng = np.random.default_rng(9)
    watch = tmp_path / "requests"
    out = tmp_path / "results"
    watch.mkdir()
    for i in range(2):
        vol = rng.normal(100, 30, (4, 80, 80)).astype(np.float32)
        t1_path = tmp_path / f"t1_{i}.mha"
        t2_path = tmp_path / f"t2_{i}.mha"
        # 80 px at 0.45 mm -> 120 px at the 0.3 mm isotropic resample,
        # inside the tiny pipeline's 128x128 slice buffer.
        write_medical_image(
            MedicalImage(array=vol, spacing=(0.45, 0.45, 3.0)), t1_path
        )
        write_medical_image(
            MedicalImage(array=vol + 5, spacing=(0.45, 0.45, 3.0)), t2_path
        )
        (watch / f"req{i}.json").write_text(
            json.dumps(
                {"study_id": f"s{i}", "t1": str(t1_path), "t2": str(t2_path)}
            )
        )
    (watch / "bad.json").write_text("{\"t1\": \"/nonexistent\"}")

    stats = serve_directory(tiny_pipeline, watch, out, once=True)
    assert stats.processed == 2 and stats.failed == 1
    for i in range(2):
        payload = json.loads((out / f"s{i}.json").read_text())
        assert payload["study_id"] == f"s{i}"
        assert np.asarray(payload["coords"]).shape == (2, 5, 2)
        assert "pfirrmann" in payload["predictions"]
        assert (watch / "done" / f"req{i}.json").exists()
    assert (watch / "failed" / "bad.json").exists()
    assert not list(watch.glob("*.json"))


def test_pipeline_mesh_sharded_matches_single_device(tiny_pipeline):
    """Data-parallel serving: the same fused graph jitted with the study
    batch sharded over an 8-device mesh must reproduce the single-device
    results (weights replicated; _pack pads the batch to the axis size)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharded = StudyInferencePipeline(
        tiny_pipeline.loc_model,
        tiny_pipeline.loc_variables,
        tiny_pipeline.cls_model,
        tiny_pipeline.cls_variables,
        config=tiny_pipeline.config,
        mesh=mesh,
    )
    rng = np.random.default_rng(11)
    studies = _synthetic_studies(5, rng)  # buckets to 8 = mesh size
    base = tiny_pipeline.run(studies)
    dp = sharded.run(studies)
    assert len(dp) == 5
    for a, b in zip(base, dp):
        np.testing.assert_allclose(a.coords, b.coords, rtol=1e-5, atol=1e-6)
        # Crops are uint8: rounding at bin edges may differ by 1 count.
        assert np.mean(np.abs(a.crops.astype(int) - b.crops.astype(int)) > 1) < 1e-3
        for k in a.logits:
            np.testing.assert_allclose(
                a.logits[k], b.logits[k], rtol=1e-4, atol=1e-4
            )


def test_pipeline_mesh_pads_to_axis_size(tiny_pipeline):
    """A 3-study batch on an 8-device mesh pads to 8 rows and still decodes
    exactly 3 results."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharded = StudyInferencePipeline(
        tiny_pipeline.loc_model,
        tiny_pipeline.loc_variables,
        tiny_pipeline.cls_model,
        tiny_pipeline.cls_variables,
        config=tiny_pipeline.config,
        mesh=mesh,
    )
    rng = np.random.default_rng(12)
    slices, hw, spacing = sharded._pack(_synthetic_studies(3, rng))
    assert slices.shape[0] == 8
    results = sharded.run(_synthetic_studies(3, rng))
    assert len(results) == 3


def test_series_crop_pipeline_mesh_sharded():
    """The dataset-build crop stage sharded over the 8-device mesh matches
    the single-device pipeline (fallback-centers path, no loc model)."""
    from jax.sharding import Mesh

    from spine_vision_tpu.infer import SeriesCropPipeline

    config = StudyPipelineConfig(
        loc_image_size=(64, 64), crop_size=(32, 32), padded_hw=(128, 128)
    )
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    base = SeriesCropPipeline(None, None, config=config)
    dp = SeriesCropPipeline(None, None, config=config, mesh=mesh)

    rng = np.random.default_rng(13)
    slices = [
        rng.normal(100, 30, (int(rng.integers(64, 128)), int(rng.integers(64, 128)))).astype(
            np.float32
        )
        for _ in range(5)
    ]
    spacings = [(0.6, 0.6)] * 5
    c0, a0, k0 = base.run(slices, spacings)
    c1, a1, k1 = dp.run(slices, spacings)
    np.testing.assert_allclose(c0, c1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a0, a1, rtol=1e-5, atol=1e-5)
    assert np.mean(np.abs(k0.astype(int) - k1.astype(int)) > 1) < 1e-3


def test_serve_requeues_orphaned_inflight(tiny_pipeline, tmp_path):
    """A request abandoned in inflight/ by a crashed server is re-queued and
    processed on the next serve_directory call."""
    import json

    from spine_vision_tpu.infer.serve import serve_directory
    from spine_vision_tpu.io.types import MedicalImage
    from spine_vision_tpu.io.writers import write_medical_image

    rng = np.random.default_rng(21)
    watch = tmp_path / "requests"
    inflight = watch / "inflight"
    inflight.mkdir(parents=True)
    vol = rng.normal(100, 30, (4, 80, 80)).astype(np.float32)
    t1, t2 = tmp_path / "t1.mha", tmp_path / "t2.mha"
    write_medical_image(MedicalImage(array=vol, spacing=(0.45, 0.45, 3.0)), t1)
    write_medical_image(MedicalImage(array=vol + 5, spacing=(0.45, 0.45, 3.0)), t2)
    (inflight / "orphan.json").write_text(
        json.dumps({"study_id": "orphan", "t1": str(t1), "t2": str(t2)})
    )

    out = tmp_path / "results"
    stats = serve_directory(tiny_pipeline, watch, out, once=True)
    assert stats.processed == 1
    assert (out / "orphan.json").exists()
    assert (watch / "done" / "orphan.json").exists()
    assert not list(inflight.glob("*.json"))


def test_serve_recovery_respects_live_owner(tiny_pipeline, tmp_path):
    """Startup recovery must re-queue a DEAD server's claims but never a
    live sibling's (same watch dir, two servers is a supported config)."""
    import json
    import os
    import socket

    from spine_vision_tpu.infer.serve import serve_directory
    from spine_vision_tpu.io.types import MedicalImage
    from spine_vision_tpu.io.writers import write_medical_image

    rng = np.random.default_rng(22)
    watch = tmp_path / "requests"
    inflight = watch / "inflight"
    host = socket.gethostname()
    live_dir = inflight / f"{host}-1"  # pid 1 always exists (init)
    dead_dir = inflight / f"{host}-999999999"  # pid can't exist (> pid_max)
    recycled_dir = inflight / f"{host}-{os.getpid()}"  # our own pid: a dead
    # predecessor's dir (no live sibling can share our pid) — must be adopted
    live_dir.mkdir(parents=True)
    dead_dir.mkdir(parents=True)
    recycled_dir.mkdir(parents=True)
    vol = rng.normal(100, 30, (4, 80, 80)).astype(np.float32)
    t1, t2 = tmp_path / "t1.mha", tmp_path / "t2.mha"
    write_medical_image(MedicalImage(array=vol, spacing=(0.45, 0.45, 3.0)), t1)
    write_medical_image(MedicalImage(array=vol + 5, spacing=(0.45, 0.45, 3.0)), t2)
    for d, sid in (
        (live_dir, "claimed_live"),
        (dead_dir, "claimed_dead"),
        (recycled_dir, "claimed_recycled"),
    ):
        (d / f"{sid}.json").write_text(
            json.dumps({"study_id": sid, "t1": str(t1), "t2": str(t2)})
        )

    out = tmp_path / "results"
    stats = serve_directory(tiny_pipeline, watch, out, once=True)
    # The dead server's and the recycled-pid predecessor's claims were
    # recovered and served; the live sibling's claim was left untouched.
    assert stats.processed == 2
    assert (out / "claimed_dead.json").exists()
    assert (out / "claimed_recycled.json").exists()
    assert not (out / "claimed_live.json").exists()
    assert (live_dir / "claimed_live.json").exists()
    assert not dead_dir.exists()


def test_two_servers_share_one_watch_dir(tiny_pipeline, tmp_path):
    """Two serve loops on the same watch directory: the atomic rename claim
    guarantees each request is processed exactly once, so serving scales
    out by just starting more servers."""
    import json
    import threading

    from spine_vision_tpu.infer.serve import serve_directory
    from spine_vision_tpu.io.types import MedicalImage
    from spine_vision_tpu.io.writers import write_medical_image

    rng = np.random.default_rng(31)
    watch = tmp_path / "requests"
    out = tmp_path / "results"
    watch.mkdir()
    n = 6
    for i in range(n):
        vol = rng.normal(100, 30, (4, 80, 80)).astype(np.float32)
        t1, t2 = tmp_path / f"t1_{i}.mha", tmp_path / f"t2_{i}.mha"
        write_medical_image(MedicalImage(array=vol, spacing=(0.45, 0.45, 3.0)), t1)
        write_medical_image(MedicalImage(array=vol + 5, spacing=(0.45, 0.45, 3.0)), t2)
        (watch / f"r{i}.json").write_text(
            json.dumps({"study_id": f"s{i}", "t1": str(t1), "t2": str(t2)})
        )

    stats = [None, None]

    def server(idx):
        stats[idx] = serve_directory(
            tiny_pipeline, watch, out, once=True, max_batch=2
        )

    threads = [threading.Thread(target=server, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(s is not None for s in stats)
    assert stats[0].processed + stats[1].processed == n
    assert stats[0].failed + stats[1].failed == 0
    done = sorted(p.name for p in (watch / "done").glob("*.json"))
    assert done == [f"r{i}.json" for i in range(n)]
    for i in range(n):
        assert (out / f"s{i}.json").exists()
