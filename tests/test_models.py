"""Smoke tests for the Flax model zoo (tiny inputs, CPU).

Each backbone family gets an init+forward shape check; the Classifier and
CoordinateRegressor get full apply + loss-function checks.

Runs with jit disabled: these are shape/plumbing tests on tiny inputs, and
eager execution skips the (minutes-long on CPU) XLA compilation of each
backbone graph. Jitted-path coverage comes from the end-to-end training
smoke tests. Set RUN_SLOW=1 to also sweep every backbone family at full size.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.core.tasks import get_tasks
from spine_vision_tpu.models import (
    BackboneFactory,
    Classifier,
    CoordinateRegressor,
    list_backbones,
    make_coordinate_loss_fn,
    make_multitask_loss_fn,
)

KEY = jax.random.PRNGKey(0)

pytestmark = pytest.mark.usefixtures("eager_mode")


@pytest.fixture(scope="module")
def eager_mode():
    jax.config.update("jax_disable_jit", True)
    yield
    jax.config.update("jax_disable_jit", False)


RUN_SLOW = os.environ.get("RUN_SLOW", "") == "1"


def _init_and_apply(module, x, train=False):
    variables = module.init({"params": KEY, "dropout": KEY}, x, train=False)
    mutable = [k for k in variables if k != "params"]
    out = module.apply(
        variables, x, train=train,
        mutable=mutable if train else False,
        rngs={"dropout": KEY} if train else None,
    )
    if train and mutable:
        out = out[0]
    return out, variables


FAST_BACKBONES = [
    ("resnet18", 512),
    ("convnext_tiny", 768),
    ("vit_tiny", 192),
]
SLOW_BACKBONES = [
    ("resnet50", 2048),
    ("resnext50", 2048),
    ("resnetrs50", 2048),
    ("convnextv2_tiny", 768),
    ("swin_tiny", 768),
    ("efficientnet_b0", 1280),
    ("mobilenetv3_small", 1024),
]


@pytest.mark.parametrize(
    "name,expected_dim",
    FAST_BACKBONES + (SLOW_BACKBONES if RUN_SLOW else []),
)
def test_backbone_forward_shapes(name, expected_dim):
    module, dim = BackboneFactory.create(name, dtype=jnp.float32)
    assert dim == expected_dim
    x = jnp.zeros((2, 64, 64, 3), dtype=jnp.float32)
    out, _ = _init_and_apply(module, x)
    assert out.shape == (2, dim)
    assert out.dtype == jnp.float32


def test_backbone_registry_covers_reference_names():
    names = list_backbones()
    assert len(names) == 46
    for required in (
        "resnet18", "convnext_base", "vit_base", "swin_base",
        "efficientnetv2_s", "mobilenetv3_large", "wide_resnet50",
        "resnetrs101", "deit_base", "convnextv2_huge",
    ):
        assert required in names
    assert list_backbones("convnext") == sorted(
        n for n in names if n.startswith("convnext")
    )


def test_classifier_multitask_forward_and_loss():
    tasks = tuple(get_tasks())
    model = Classifier(backbone_name="resnet18", tasks=tasks, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    out, variables = _init_and_apply(model, x)
    assert set(out) == {t.name for t in tasks}
    assert out["pfirrmann"].shape == (2, 5)
    assert out["modic"].shape == (2, 4)
    assert out["herniation"].shape == (2, 1)

    loss_fn = make_multitask_loss_fn(tasks)
    targets = {
        "pfirrmann": jnp.array([0, 4]),
        "modic": jnp.array([0, 3]),
        "herniation": jnp.array([0.0, 1.0]),
        "bulging": jnp.array([0.0, 1.0]),
        "upper_endplate": jnp.array([0.0, 0.0]),
        "lower_endplate": jnp.array([1.0, 1.0]),
        "spondy": jnp.array([0.0, 1.0]),
        "narrowing": jnp.array([1.0, 0.0]),
    }
    loss = loss_fn(out, targets)
    assert np.isfinite(float(loss))
    assert float(loss) > 0

    # Missing tasks are skipped, reducing the loss.
    partial_loss = loss_fn({"pfirrmann": out["pfirrmann"]}, targets)
    assert float(partial_loss) < float(loss)


def test_classifier_train_mode_updates_batch_stats():
    model = Classifier(
        backbone_name="resnet18", tasks=tuple(get_tasks(["herniation"])),
        dtype=jnp.float32,
    )
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init({"params": KEY, "dropout": KEY}, x, train=False)
    assert "batch_stats" in variables
    out, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": KEY}
    )
    assert "batch_stats" in updates


def test_coordinate_regressor_output_range_and_loss():
    model = CoordinateRegressor(backbone_name="resnet18", dtype=jnp.float32)
    x = jnp.zeros((3, 64, 64, 3))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (3, 5, 2)
    assert float(jnp.min(out)) >= 0.0
    assert float(jnp.max(out)) <= 1.0

    loss_fn = make_coordinate_loss_fn("smooth_l1")
    targets = jnp.full((3, 5, 2), 0.5)
    mask = jnp.ones((3, 5))
    loss = loss_fn(out, targets, mask)
    assert np.isfinite(float(loss))


def test_multitask_loss_sample_weight_excludes_padding():
    """Weighted loss over a padded batch (pad rows repeat the last sample,
    weight 0) must equal the unweighted loss over the unpadded batch —
    the exact-eval-loss contract used by BaseTrainer._shard_eval."""
    tasks = get_tasks(["pfirrmann", "herniation"])
    loss_fn = make_multitask_loss_fn(tasks)
    rng = np.random.default_rng(0)
    n, pad = 5, 3
    preds = {
        "pfirrmann": jnp.asarray(rng.normal(size=(n, 5)), jnp.float32),
        "herniation": jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
    }
    targets = {
        "pfirrmann": jnp.asarray(rng.integers(0, 5, size=(n,))),
        "herniation": jnp.asarray(rng.integers(0, 2, size=(n,))),
    }
    base = float(loss_fn(preds, targets))

    def pad_last(x):
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)

    padded_preds = {k: pad_last(v) for k, v in preds.items()}
    padded_targets = {k: pad_last(v) for k, v in targets.items()}
    weight = jnp.asarray([1.0] * n + [0.0] * pad)
    weighted = float(loss_fn(padded_preds, padded_targets, sample_weight=weight))
    unweighted = float(loss_fn(padded_preds, padded_targets))

    np.testing.assert_allclose(weighted, base, rtol=1e-6)
    assert not np.isclose(unweighted, base, rtol=1e-6)  # the bias being fixed


def test_resnet_impl_defaults_are_the_bisected_ones():
    """Round-5 bisect pinned the defaults: norm=tpu (TpuBatchNorm,
    perf-neutral-or-better), pool=flax (nn.max_pool — the scatter-free
    pool measured 4.6x slower in training, BASELINE.md bisect table).
    Round 4 shipped a default flip without re-measuring the benched path;
    this pin makes any future flip a deliberate, test-visible change."""
    from spine_vision_tpu.models import Classifier, CoordinateRegressor
    from spine_vision_tpu.models.resnet import ResNet
    from spine_vision_tpu.train.classification import ClassificationConfig
    from spine_vision_tpu.train.localization import LocalizationConfig

    assert ResNet.norm_impl == "tpu"
    assert ResNet.pool_impl == "flax"
    assert Classifier.norm_impl == "tpu"
    assert Classifier.pool_impl == "flax"
    assert CoordinateRegressor.norm_impl == "tpu"
    assert CoordinateRegressor.pool_impl == "flax"
    assert ClassificationConfig.model_fields["norm_impl"].default == "tpu"
    assert ClassificationConfig.model_fields["pool_impl"].default == "flax"
    assert LocalizationConfig.model_fields["norm_impl"].default == "tpu"
    assert LocalizationConfig.model_fields["pool_impl"].default == "flax"
