"""spine-vision-tpu: TPU-native lumbar-spine MRI analysis framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
nghiant03/spine-vision reference (PyTorch/CUDA). The compute path is
jit-compiled and sharded over TPU meshes; host-side I/O (DICOM/NIfTI/MHA/NRRD
decode, PDF, tabular) is owned by this package rather than delegated to
SimpleITK/PyMuPDF.

Layers (mirroring reference layer map, SURVEY.md §1):
    core/     configs, logging, task registry + strategies
    ops/      jitted/Pallas device kernels (normalize, resample, fused crop)
    io/       host-side medical image + tabular + PDF I/O
    data/     dataset builders (localization, phenikaa OCR, classification)
    models/   Flax backbones, heads, Classifier, CoordinateRegressor, OCR nets
    train/    train state, jitted steps, trainers, checkpoints, schedules
    parallel/ device mesh construction, shardings, collective helpers
    metrics/  MED/PCK localization + multi-task classification metrics
    infer/    fused two-stage study inference graph
    viz/      plot set + experiment tracking mirror
    cli/      spine-vision-tpu CLI (dataset/train/test/evaluate/bench)
"""

__version__ = "0.1.0"
