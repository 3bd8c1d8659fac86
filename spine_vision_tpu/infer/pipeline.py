"""Fused two-stage study inference: localization -> crop -> grading, one jit.

The reference chains these stages host-side with a device round trip per
image (datasets/classification/spider.py:114-152, cropping.py:444-483: a
batch-1 forward, ``.cpu().numpy()``, cv2 warps, another forward). Here the
whole per-study graph runs as ONE compiled XLA program over a batch of
studies:

    padded sagittal slices [N, S, Hp, Wp]
      -> per-slice min-max normalize (masked to the true extent)
      -> dynamic-extent resize to the localization input (512^2)
      -> ConvNeXt localization forward           [N*S, L, 2] coords
      -> spine-tangent rotation angles (traced)  [N*S, L]
      -> mm->pixel crop deltas from per-slice spacing
      -> fused rotate+crop+normalize+letterbox   [N*S, L, ch, cw] uint8
      -> [T2, T1, T2] channel assembly           [N*L, ch, cw, 3]
      -> ResNet multi-task grading forward       {task: [N, L, C]}

Slice sizes vary per study; buffers are padded to a static (Hp, Wp) with the
true (h, w) carried as traced integers, so there is exactly one compiled
program per batch size.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.core import logger
from spine_vision_tpu.core.tasks import (
    TaskConfig,
    compute_predictions_for_tasks,
    compute_probabilities_for_tasks,
    get_tasks,
)
from spine_vision_tpu.models import Classifier, CoordinateRegressor
from spine_vision_tpu.ops.crop import crop_ivd_regions_impl
from spine_vision_tpu.ops.geometry import mm_to_pixels_jax, rotation_angles_jax
from spine_vision_tpu.ops.image import imagenet_normalize, resize_dynamic

SERIES_ORDER = ("sag_t1", "sag_t2")  # index 0 = T1, 1 = T2


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _bucket_count(n: int, bucket: bool, multiple: int) -> int:
    """Padded batch size: power-of-two bucket (serving-shape stability) then
    rounded to a mesh-axis multiple (shardability)."""
    if bucket and n > 0:
        n = 1 << (n - 1).bit_length()
    if multiple > 1 and n > 0:
        n = _round_up(n, multiple)
    return n


def _place_slice(
    dst: np.ndarray, hw_row: np.ndarray, arr: np.ndarray,
    padded_hw: tuple[int, int],
) -> None:
    """Copy one slice into its padded buffer row and record its extent."""
    h, w = arr.shape
    hp, wp = padded_hw
    if h > hp or w > wp:
        raise ValueError(f"slice {arr.shape} exceeds padded_hw {padded_hw}")
    dst[:h, :w] = arr
    hw_row[:] = (h, w)


def _fallback_centers(num_levels: int) -> np.ndarray:
    """Center-column fallback disc centers for any level count (the 5-level
    table matches the reference's get_center_fallback_locations)."""
    if num_levels == len(DEFAULT_IVD_CENTERS_XY):
        return DEFAULT_IVD_CENTERS_XY
    y = np.linspace(0.25, 0.65, num_levels, dtype=np.float32)
    return np.stack([np.full(num_levels, 0.5, np.float32), y], axis=-1)

# Approximate normalized (x, y) IVD centers L1/L2..L5/S1 used when no
# localization model is available (reference cropping.py:28-34, 486-492).
DEFAULT_IVD_CENTERS_XY = np.array(
    [(0.5, 0.25), (0.5, 0.35), (0.5, 0.45), (0.5, 0.55), (0.5, 0.65)],
    dtype=np.float32,
)


@dataclass(frozen=True)
class StudyPipelineConfig:
    """Static configuration of the fused study graph.

    Defaults mirror the reference classification dataset config
    (datasets/classification/config.py:12-83).
    """

    loc_image_size: tuple[int, int] = (512, 512)
    crop_size: tuple[int, int] = (256, 256)
    crop_delta_mm: tuple[float, float, float, float] = (55.0, 15.0, 17.5, 20.0)
    crop_mode: str = "horizontal"  # "horizontal" | "rotated" (reference
    # ClassificationDatasetConfig default is horizontal, config.py:44; the
    # horizontal path is also fully gather-free on TPU)
    last_disc_angle_boost: float = 1.0
    num_levels: int = 5
    padded_hw: tuple[int, int] = (1024, 1024)
    # Serving-shape stability: pad each batch of studies up to the next
    # power of two so a varying request size reuses a handful of compiled
    # graphs instead of retracing per distinct N (a remote TPU compile
    # costs 30-300 s; the padded rows are dummy 1x1 slices and their
    # results are sliced off). Set False for exact-N execution.
    bucket_batches: bool = True


@dataclass
class StudyInput:
    """One study: middle sagittal slices per series with their spacing."""

    t1_slice: np.ndarray  # [h, w] raw intensities
    t2_slice: np.ndarray
    t1_spacing: tuple[float, float]  # (row, col) mm/px of the sagittal plane
    t2_spacing: tuple[float, float]
    study_id: str = ""


def study_input_from_paths(
    t1_path: Path,
    t2_path: Path,
    study_id: str = "",
) -> StudyInput:
    """Build a StudyInput from volume paths (DICOM dir / .mha / .nii / .nrrd).

    Decodes each series and extracts its 0.3 mm-isotropic middle sagittal
    slice + plane spacing directly (io.series — equal to the reference's
    full-volume resample + orient + slice, reference phenikaa.py:176-183,
    cropping.py:37-101, without materializing the resampled volume). Shared
    with the classification dataset builder so training-time and
    inference-time preparation cannot diverge.
    """
    from concurrent.futures import ThreadPoolExecutor

    from spine_vision_tpu.io.series import prepare_series_slice

    # The two series decode independently: the host-side parse/entropy
    # decode overlaps across threads (GIL released in the C/numpy parts),
    # while the in-plane resample's device matmuls serialize on the device
    # queue either way. Submitting both surfaces whichever error comes
    # first instead of silently discarding one.
    with ThreadPoolExecutor(max_workers=2) as pool:
        t1_future = pool.submit(prepare_series_slice, t1_path)
        t2_future = pool.submit(prepare_series_slice, t2_path)
        t1_slice, t1_spacing = t1_future.result()
        t2_slice, t2_spacing = t2_future.result()
    return StudyInput(
        t1_slice=t1_slice,
        t2_slice=t2_slice,
        t1_spacing=t1_spacing,
        t2_spacing=t2_spacing,
        study_id=study_id or Path(t2_path).stem,
    )


@dataclass
class StudyResult:
    """Per-study outputs of the fused graph (host numpy)."""

    study_id: str
    coords: np.ndarray  # [S, L, 2] normalized per-series disc centers
    angles: np.ndarray  # [S, L] rotation angles (deg)
    crops: np.ndarray | None  # [S, L, ch, cw] uint8 crops (None if not fetched)
    logits: dict[str, np.ndarray]  # task -> [L, C]
    predictions: dict[str, np.ndarray] = field(default_factory=dict)
    probabilities: dict[str, np.ndarray] = field(default_factory=dict)


def _normalize_slices_masked(
    flat: jax.Array, flat_hw: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-slice min-max -> [0, 255] over the true extent only
    (reference normalize_to_uint8, io/__init__.py:15-31).

    Returns (normalized [M, Hp, Wp], valid mask [M, Hp, Wp]).
    """
    _, hp, wp = flat.shape
    rows = jnp.arange(hp)[None, :, None]
    cols = jnp.arange(wp)[None, None, :]
    valid = (rows < flat_hw[:, 0, None, None]) & (cols < flat_hw[:, 1, None, None])
    big = jnp.float32(3.4e38)
    smin = jnp.min(jnp.where(valid, flat, big), axis=(1, 2), keepdims=True)
    smax = jnp.max(jnp.where(valid, flat, -big), axis=(1, 2), keepdims=True)
    inv = jnp.where(smax > smin, 1.0 / jnp.maximum(smax - smin, 1e-12), 0.0)
    return jnp.where(valid, (flat - smin) * inv * 255.0, 0.0), valid


def loc_and_crop(
    loc_model: CoordinateRegressor | None,
    cfg: StudyPipelineConfig,
    loc_vars: Any,
    flat: jax.Array,  # [M, Hp, Wp] float32 raw intensities
    flat_hw: jax.Array,  # [M, 2] int32
    flat_spacing: jax.Array,  # [M, 2] float32 (row, col) mm/px
    centers_override: jax.Array | None = None,  # [M, L, 2] skips the forward
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Traced localization + fused crop over a flat batch of slices.

    Returns (coords [M, L, 2], angles [M, L], crops [M, L, ch, cw] uint8).
    """
    m = flat.shape[0]
    flat, _ = _normalize_slices_masked(flat.astype(jnp.float32), flat_hw)

    if centers_override is not None:
        coords = centers_override.astype(jnp.float32)
    else:
        assert loc_model is not None
        lh, lw = cfg.loc_image_size
        loc_in = jax.vmap(lambda im, e: resize_dynamic(im, e, lh, lw))(
            flat, flat_hw
        )
        loc_rgb = imagenet_normalize(
            jnp.repeat(loc_in[..., None] / 255.0, 3, axis=-1)
        )
        coords = loc_model.apply(
            loc_vars, loc_rgb.astype(jnp.float32), train=False
        ).astype(jnp.float32)

    if cfg.crop_mode == "rotated":
        angles = jax.vmap(
            lambda c, e: rotation_angles_jax(c, e, cfg.last_disc_angle_boost)
        )(coords, flat_hw)
    else:
        angles = jnp.zeros((m, cfg.num_levels), dtype=jnp.float32)

    delta_mm = jnp.asarray(cfg.crop_delta_mm, dtype=jnp.float32)
    deltas = jax.vmap(lambda sp: mm_to_pixels_jax(delta_mm, sp))(flat_spacing)

    ch, cw = cfg.crop_size
    crop_fn = functools.partial(
        crop_ivd_regions_impl,
        crop_h=ch,
        crop_w=cw,
        separable=cfg.crop_mode != "rotated",
    )
    crops = jax.vmap(lambda im, c, a, d, e: crop_fn(im, c, a, d, image_hw=e))(
        flat, coords, angles, deltas, flat_hw
    )
    return coords, angles, crops


class SeriesCropPipeline:
    """Batched localization + fused IVD cropping for dataset building.

    The reference's crop pipeline runs per image with host round trips
    (cropping.py:444-483 + 258-354); this runs a whole batch of series
    slices through one jit. With ``loc_variables=None`` the default
    fallback centers are used (reference get_center_fallback_locations).
    """

    def __init__(
        self,
        loc_model: CoordinateRegressor | None,
        loc_variables: Any,
        config: StudyPipelineConfig | None = None,
        mesh: Any | None = None,
    ) -> None:
        """``mesh``: optional ``jax.sharding.Mesh`` — slice batches are
        sharded over its first axis (see StudyInferencePipeline)."""
        self.config = config or StudyPipelineConfig()
        self.loc_model = loc_model
        self.loc_variables = loc_variables

        def run(loc_vars, flat, hw, spacing, centers):
            override = centers if self.loc_model is None else None
            return loc_and_crop(
                self.loc_model, self.config, loc_vars, flat, hw, spacing,
                centers_override=override,
            )

        if mesh is None:
            self._batch_multiple = 1
            self._run = jax.jit(run)
        else:
            from spine_vision_tpu.parallel import batch_sharded_jit

            self._batch_multiple = mesh.shape[mesh.axis_names[0]]
            self._run = batch_sharded_jit(run, mesh, n_replicated=1, n_sharded=4)

    def run(
        self,
        slices: list[np.ndarray],
        spacings: list[tuple[float, float]],
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Crop a batch of sagittal slices.

        Args:
            slices: list of [h, w] raw-intensity arrays.
            spacings: matching (row, col) mm/px spacings.

        Returns:
            (coords [M, L, 2], angles [M, L], crops [M, L, ch, cw] uint8).
        """
        hp, wp = self.config.padded_hw
        n_real = len(slices)
        m = _bucket_count(n_real, self.config.bucket_batches, self._batch_multiple)
        flat = np.zeros((m, hp, wp), dtype=np.float32)
        # Dummy rows carry 1x1 extents so the masked normalize stays finite.
        hw = np.ones((m, 2), dtype=np.int32)
        for i, sl in enumerate(slices):
            _place_slice(
                flat[i], hw[i], np.asarray(sl, dtype=np.float32),
                self.config.padded_hw,
            )
        spacing = np.ones((m, 2), dtype=np.float32)
        spacing[:n_real] = np.asarray(spacings, dtype=np.float32)
        centers = np.broadcast_to(
            _fallback_centers(self.config.num_levels)[None],
            (m, self.config.num_levels, 2),
        ).copy()
        # numpy straight into jit: with mesh in_shardings each shard is
        # placed host->device directly (jnp.asarray would stage the whole
        # batch on one device first, then reshard).
        coords, angles, crops = self._run(
            self.loc_variables, flat, hw, spacing, centers
        )
        return (
            np.asarray(jax.device_get(coords))[:n_real],
            np.asarray(jax.device_get(angles))[:n_real],
            np.asarray(jax.device_get(crops))[:n_real],
        )


class StudyInferencePipeline:
    """Batched fused localization->crop->grading executor."""

    def __init__(
        self,
        loc_model: CoordinateRegressor,
        loc_variables: Any,
        cls_model: Classifier,
        cls_variables: Any,
        config: StudyPipelineConfig | None = None,
        tasks: list[TaskConfig] | None = None,
        mesh: Any | None = None,
    ) -> None:
        """``mesh``: optional ``jax.sharding.Mesh`` — the study batch dim is
        sharded over its FIRST axis (weights replicated), so one fused call
        data-parallels over every device in the mesh. Results are gathered
        for host decode; ``_pack`` pads the batch to a multiple of the axis
        size. Serving-side scale-out the reference gets from one process per
        GPU (Accelerate), done TPU-style: one program, sharded batch."""
        self.config = config or StudyPipelineConfig()
        self.loc_model = loc_model
        self.cls_model = cls_model
        self.loc_variables = loc_variables
        self.cls_variables = cls_variables
        self.tasks = tasks if tasks is not None else get_tasks()
        self.mesh = mesh
        if mesh is None:
            self._batch_multiple = 1
        else:
            self._batch_multiple = mesh.shape[mesh.axis_names[0]]
        self._run = self._make_run(include_crops=True)
        self._run_nocrops: Any = None  # compiled lazily on first serve call

    def _make_run(self, include_crops: bool) -> Any:
        fn = functools.partial(self._fused, include_crops=include_crops)
        if self.mesh is None:
            return jax.jit(fn)
        from spine_vision_tpu.parallel import batch_sharded_jit

        return batch_sharded_jit(fn, self.mesh, n_replicated=2, n_sharded=3)

    # ------------------------------------------------------------------
    # The fused graph
    # ------------------------------------------------------------------
    def _fused(
        self,
        loc_vars: Any,
        cls_vars: Any,
        slices: jax.Array,  # [N, S, Hp, Wp] float32, raw intensities
        hw: jax.Array,  # [N, S, 2] int32 true extents
        spacing: jax.Array,  # [N, S, 2] float32 (row, col) mm/px
        include_crops: bool = True,  # trace-time flag (baked by _make_run)
    ) -> dict[str, Any]:
        cfg = self.config
        n, s, hp, wp = slices.shape
        ns = n * s
        flat = slices.reshape(ns, hp, wp).astype(jnp.float32)
        flat_hw = hw.reshape(ns, 2)
        flat_spacing = spacing.reshape(ns, 2)

        ch, cw = cfg.crop_size
        coords, angles, crops = loc_and_crop(
            self.loc_model, cfg, loc_vars, flat, flat_hw, flat_spacing
        )
        crops = crops.reshape(n, s, cfg.num_levels, ch, cw)

        # Channel assembly [T2, T1, T2] (reference construct_3channel,
        # training/datasets/classification.py:40-68).
        t1 = crops[:, 0].astype(jnp.float32) / 255.0
        t2 = crops[:, 1].astype(jnp.float32) / 255.0
        rgb = jnp.stack([t2, t1, t2], axis=-1)  # [N, L, ch, cw, 3]
        cls_in = imagenet_normalize(rgb.reshape(n * cfg.num_levels, ch, cw, 3))
        logits = self.cls_model.apply(cls_vars, cls_in, train=False)
        logits = {
            k: v.reshape(n, cfg.num_levels, *v.shape[1:]).astype(jnp.float32)
            for k, v in logits.items()
        }

        out = {
            "coords": coords.reshape(n, s, cfg.num_levels, 2),
            "angles": angles.reshape(n, s, cfg.num_levels),
            "logits": logits,
        }
        if include_crops:
            out["crops"] = crops
        return out

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------
    def _pack(
        self, studies: list[StudyInput]
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        hp, wp = self.config.padded_hw
        n = _bucket_count(
            len(studies), self.config.bucket_batches, self._batch_multiple
        )
        slices = np.zeros((n, 2, hp, wp), dtype=np.float32)
        # Dummy rows (beyond len(studies)) carry 1x1 extents so the masked
        # normalize/resize stay finite; their outputs are sliced off.
        hw = np.ones((n, 2, 2), dtype=np.int32)
        spacing = np.ones((n, 2, 2), dtype=np.float32)
        for i, study in enumerate(studies):
            for j, (sl, sp) in enumerate(
                (
                    (study.t1_slice, study.t1_spacing),
                    (study.t2_slice, study.t2_spacing),
                )
            ):
                _place_slice(
                    slices[i, j], hw[i, j],
                    np.asarray(sl, dtype=np.float32), self.config.padded_hw,
                )
                spacing[i, j] = sp
        return slices, hw, spacing

    def run(
        self, studies: list[StudyInput], fetch_crops: bool = True
    ) -> list[StudyResult]:
        """Run the fused graph on a batch of studies, decode on host.

        ``fetch_crops=False`` runs a variant of the fused graph whose traced
        outputs omit the crop tensor ([N, S, L, ch, cw] uint8 — by far the
        largest output) entirely, so the serving path neither materialises
        nor transfers it; ``StudyResult.crops`` is then None. The variant is
        compiled lazily on first use.
        """
        slices, hw, spacing = self._pack(studies)
        if fetch_crops:
            run = self._run
        else:
            if self._run_nocrops is None:
                self._run_nocrops = self._make_run(include_crops=False)
            run = self._run_nocrops
        # numpy straight into jit: with mesh in_shardings each shard is
        # placed host->device directly (jnp.asarray would stage the whole
        # batch on one device first, then reshard).
        out = run(self.loc_variables, self.cls_variables, slices, hw, spacing)
        out = jax.device_get(out)
        results = []
        for i, study in enumerate(studies):
            logits = {k: np.asarray(v[i]) for k, v in out["logits"].items()}
            results.append(
                StudyResult(
                    study_id=study.study_id,
                    coords=np.asarray(out["coords"][i]),
                    angles=np.asarray(out["angles"][i]),
                    crops=np.asarray(out["crops"][i]) if fetch_crops else None,
                    logits=logits,
                    predictions=compute_predictions_for_tasks(logits, self.tasks),
                    probabilities=compute_probabilities_for_tasks(
                        logits, self.tasks
                    ),
                )
            )
        return results

    # ------------------------------------------------------------------
    # Construction from trained checkpoints
    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoints(
        cls,
        loc_checkpoint: Path,
        cls_checkpoint: Path,
        loc_backbone: str = "convnext_base",
        cls_backbone: str = "resnet18",
        config: StudyPipelineConfig | None = None,
        tasks: list[TaskConfig] | None = None,
        dtype: Any = jnp.bfloat16,
        use_pallas: bool | None = None,
        mesh: Any | None = None,
    ) -> "StudyInferencePipeline":
        """Load both stages from orbax run dirs (train/checkpoint.py layout).

        ``use_pallas`` enables the fused Pallas forward kernels (measured
        1.66x for ConvNeXt-base on v5e; param trees are identical so any
        checkpoint loads either way). Default: on for TPU backends, off on
        CPU (where Pallas must interpret).
        """
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        import optax

        from spine_vision_tpu.train.checkpoint import load_checkpoint
        from spine_vision_tpu.train.state import TrainState

        config = config or StudyPipelineConfig()
        task_list = tasks if tasks is not None else get_tasks()

        loc_model = CoordinateRegressor(
            backbone_name=loc_backbone,
            num_levels=config.num_levels,
            dtype=dtype,
            use_pallas=use_pallas,
        )
        lh, lw = config.loc_image_size
        loc_init = loc_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, lh, lw, 3), dtype=dtype),
            train=False,
        )
        loc_state = TrainState.create(
            params=loc_init["params"],
            tx=optax.identity(),
            batch_stats=loc_init.get("batch_stats"),
        )
        loc_state, _ = load_checkpoint(
            Path(loc_checkpoint), loc_state, restore_opt_state=False
        )

        cls_model = Classifier(
            backbone_name=cls_backbone,
            tasks=tuple(task_list),
            dtype=dtype,
            use_pallas=use_pallas,
        )
        ch, cw = config.crop_size
        cls_init = cls_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, ch, cw, 3), dtype=dtype),
            train=False,
        )
        cls_state = TrainState.create(
            params=cls_init["params"],
            tx=optax.identity(),
            batch_stats=cls_init.get("batch_stats"),
        )
        cls_state, _ = load_checkpoint(
            Path(cls_checkpoint), cls_state, restore_opt_state=False
        )

        logger.info(
            "Loaded pipeline: loc=%s (%s), cls=%s (%s)",
            loc_backbone,
            loc_checkpoint,
            cls_backbone,
            cls_checkpoint,
        )
        return cls(
            loc_model,
            loc_state.variables(),
            cls_model,
            cls_state.variables(),
            config=config,
            tasks=task_list,
            mesh=mesh,
        )
