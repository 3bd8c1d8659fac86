"""spine-vision-tpu command line interface.

Subcommand tree (reference cli/__init__.py:33-131, plus the evaluate/bench
surface the reference documents but does not implement):

    spine-vision-tpu dataset localization [options]
    spine-vision-tpu dataset phenikaa [options]
    spine-vision-tpu dataset classification [options]
    spine-vision-tpu train localization [options]
    spine-vision-tpu train classification [options]
    spine-vision-tpu evaluate localization --checkpoint-path ...
    spine-vision-tpu evaluate classification --checkpoint-path ...
    spine-vision-tpu test / infer / serve
    spine-vision-tpu convert --checkpoint r18.pth --arch resnet18 --output r18.npz
    spine-vision-tpu bench / parity / train-ocr

Configs are pydantic models rendered to argparse options (config_args).
"""

from __future__ import annotations

import argparse
import sys

from spine_vision_tpu.cli.config_args import add_config_args, config_from_args
from spine_vision_tpu.core import logger, setup_logger


def _build_parser() -> argparse.ArgumentParser:
    from spine_vision_tpu.data.builders import (
        ClassificationDatasetConfig,
        LocalizationDatasetConfig,
    )
    from spine_vision_tpu.data.phenikaa import PreprocessConfig
    from spine_vision_tpu.train.classification import ClassificationConfig
    from spine_vision_tpu.train.localization import LocalizationConfig

    parser = argparse.ArgumentParser(
        prog="spine-vision-tpu",
        description="TPU-native lumbar-spine MRI pipeline",
    )
    commands = parser.add_subparsers(dest="command", required=True)

    dataset = commands.add_parser("dataset", help="Dataset construction")
    dataset_sub = dataset.add_subparsers(dest="subcommand", required=True)
    add_config_args(
        dataset_sub.add_parser("localization", help="Build localization dataset"),
        LocalizationDatasetConfig,
    )
    add_config_args(
        dataset_sub.add_parser("phenikaa", help="Phenikaa OCR preprocessing"),
        PreprocessConfig,
    )
    add_config_args(
        dataset_sub.add_parser(
            "classification", help="Build classification crop dataset"
        ),
        ClassificationDatasetConfig,
    )

    train = commands.add_parser("train", help="Model training")
    train_sub = train.add_subparsers(dest="subcommand", required=True)
    add_config_args(
        train_sub.add_parser("localization", help="Train coordinate regressor"),
        LocalizationConfig,
    )
    add_config_args(
        train_sub.add_parser("classification", help="Train multi-task grader"),
        ClassificationConfig,
    )

    evaluate = commands.add_parser("evaluate", help="Checkpoint evaluation")
    evaluate_sub = evaluate.add_subparsers(dest="subcommand", required=True)
    add_config_args(
        evaluate_sub.add_parser("localization", help="Evaluate localization"),
        LocalizationConfig,
    )
    add_config_args(
        evaluate_sub.add_parser("classification", help="Evaluate classification"),
        ClassificationConfig,
    )

    test = commands.add_parser(
        "test", help="Ad-hoc timed inference on image files"
    )
    test.add_argument("--checkpoint-path", required=True)
    test.add_argument("--images", nargs="+", required=True)
    test.add_argument(
        "--model-kind",
        choices=["classification", "localization"],
        default="classification",
    )
    test.add_argument("--backbone", default="resnet18")
    test.add_argument("--image-size", nargs=2, type=int, default=[256, 256])
    test.add_argument("-v", "--verbose", action="store_true")

    infer = commands.add_parser(
        "infer", help="Fused two-stage study inference (loc -> crop -> grade)"
    )
    infer.add_argument("--loc-checkpoint", required=True)
    infer.add_argument("--cls-checkpoint", required=True)
    infer.add_argument(
        "--t1", required=True, nargs="+",
        help="T1 series per study (DICOM dir / .mha / .nii / .nrrd)",
    )
    infer.add_argument(
        "--t2", required=True, nargs="+", help="T2 series per study"
    )
    infer.add_argument("--loc-backbone", default="convnext_base")
    infer.add_argument("--cls-backbone", default="resnet18")
    infer.add_argument(
        "--crop-mode", choices=["horizontal", "rotated"], default="horizontal"
    )
    infer.add_argument(
        "--padded-hw", nargs=2, type=int, default=None,
        help="Static slice buffer; default auto-buckets (512/768/1024/1536/"
        "2048) from the loaded series so one compile covers similar sizes",
    )
    infer.add_argument("--output-json", default=None)
    infer.add_argument("-v", "--verbose", action="store_true")

    serve = commands.add_parser(
        "serve",
        help="Batch-serving daemon: drain request JSONs through the fused "
        "study pipeline",
    )
    serve.add_argument("--loc-checkpoint", required=True)
    serve.add_argument("--cls-checkpoint", required=True)
    serve.add_argument(
        "--watch-dir", required=True,
        help='Directory receiving {"study_id","t1","t2"} request JSON files',
    )
    serve.add_argument("--output-dir", required=True)
    serve.add_argument("--loc-backbone", default="convnext_base")
    serve.add_argument("--cls-backbone", default="resnet18")
    serve.add_argument(
        "--crop-mode", choices=["horizontal", "rotated"], default="horizontal"
    )
    serve.add_argument("--padded-hw", nargs=2, type=int, default=[1024, 1024])
    serve.add_argument("--max-batch", type=int, default=16)
    serve.add_argument("--poll-interval", type=float, default=0.5)
    serve.add_argument(
        "--once", action="store_true",
        help="Drain the current backlog and exit (batch-job mode)",
    )
    serve.add_argument(
        "--data-parallel", action="store_true",
        help="Shard each request batch over ALL local devices (one fused "
        "program, batch dim sharded; weights replicated)",
    )
    serve.add_argument("-v", "--verbose", action="store_true")

    convert = commands.add_parser(
        "convert",
        help="Convert a torch backbone checkpoint to the native .npz "
        "artifact (consumed torch-free by --pretrained-path)",
    )
    convert.add_argument(
        "--checkpoint", required=True, help="torch .pth/.pt state-dict file"
    )
    convert.add_argument(
        "--arch", required=True,
        help="Backbone name (models/backbone.py registry, e.g. resnet18)",
    )
    convert.add_argument("--output", required=True, help="Output .npz path")
    convert.add_argument("-v", "--verbose", action="store_true")

    commands.add_parser("bench", help="Run the benchmark harness")

    parity = commands.add_parser(
        "parity",
        help="Quality-parity harness: synthetic loc/cls/fused-infer quality run",
    )
    parity.add_argument("--output-dir", required=True)
    parity.add_argument("--seed", type=int, default=0)
    parity.add_argument(
        "--norm-impl", choices=["tpu", "flax"], default="tpu",
        help="ResNet BatchNorm implementation under test",
    )
    parity.add_argument(
        "--pool-impl", choices=["tpu", "flax"], default="flax",
        help="ResNet stem max-pool implementation under test",
    )
    parity.add_argument("-v", "--verbose", action="store_true")

    ocr = commands.add_parser(
        "train-ocr", help="Train the OCR detector+recognizer on rendered text"
    )
    ocr.add_argument("--output-dir", default=None)
    ocr.add_argument("--recognizer-steps", type=int, default=4000)
    ocr.add_argument("--detector-steps", type=int, default=1200)
    ocr.add_argument("--seed", type=int, default=0)
    ocr.add_argument("-v", "--verbose", action="store_true")
    return parser


def cli(argv: list[str] | None = None) -> int:
    """Console entry point."""
    parser = _build_parser()
    args = parser.parse_args(argv)

    setup_logger(verbose=getattr(args, "verbose", False))

    if args.command == "dataset":
        if args.subcommand == "localization":
            from spine_vision_tpu.data.builders import (
                LocalizationDatasetConfig,
                create_localization_dataset,
            )

            config = config_from_args(LocalizationDatasetConfig, args)
            config.output_path.mkdir(parents=True, exist_ok=True)
            result = create_localization_dataset(config)
        elif args.subcommand == "phenikaa":
            from spine_vision_tpu.data.phenikaa import (
                PreprocessConfig,
                preprocess_phenikaa,
            )

            result = preprocess_phenikaa(config_from_args(PreprocessConfig, args))
        else:
            from spine_vision_tpu.data.builders import (
                ClassificationDatasetConfig,
                create_classification_dataset,
            )

            config = config_from_args(ClassificationDatasetConfig, args)
            config.output_path.mkdir(parents=True, exist_ok=True)
            result = create_classification_dataset(config)
        logger.info("%s", result.summary)
        return 0

    if args.command == "train":
        from spine_vision_tpu.cli.train import (
            train_classification,
            train_localization,
        )
        from spine_vision_tpu.train.classification import ClassificationConfig
        from spine_vision_tpu.train.localization import LocalizationConfig

        if args.subcommand == "localization":
            train_localization(config_from_args(LocalizationConfig, args))
        else:
            train_classification(config_from_args(ClassificationConfig, args))
        return 0

    if args.command == "evaluate":
        from spine_vision_tpu.cli.train import (
            evaluate_classification,
            evaluate_localization,
        )
        from spine_vision_tpu.train.classification import ClassificationConfig
        from spine_vision_tpu.train.localization import LocalizationConfig

        if args.subcommand == "localization":
            evaluate_localization(config_from_args(LocalizationConfig, args))
        else:
            evaluate_classification(config_from_args(ClassificationConfig, args))
        return 0

    if args.command == "test":
        from spine_vision_tpu.cli.train import test_inference_command

        test_inference_command(
            checkpoint_path=args.checkpoint_path,
            images=args.images,
            model_kind=args.model_kind,
            backbone=args.backbone,
            image_size=tuple(args.image_size),
        )
        return 0

    if args.command == "infer":
        import json

        from spine_vision_tpu.infer import (
            StudyInferencePipeline,
            StudyPipelineConfig,
            study_input_from_paths,
        )

        if len(args.t1) != len(args.t2):
            parser.error("--t1 and --t2 must list the same number of series")
        studies = [
            study_input_from_paths(t1, t2, study_id=f"study{i}")
            for i, (t1, t2) in enumerate(zip(args.t1, args.t2))
        ]
        if args.padded_hw is not None:
            padded_hw = tuple(args.padded_hw)
        else:
            # Auto-bucket: smallest standard size covering every slice, so
            # the compile is reused across runs with similar series instead
            # of the user guessing a big-enough static buffer.
            largest = max(
                max(s.t1_slice.shape + s.t2_slice.shape) for s in studies
            )
            padded_hw = next(
                ((b, b) for b in (512, 768, 1024, 1536, 2048) if b >= largest),
                (-(-largest // 256) * 256,) * 2,
            )
            logger.info("Auto-selected padded_hw bucket: %s", padded_hw)
        pipeline = StudyInferencePipeline.from_checkpoints(
            loc_checkpoint=args.loc_checkpoint,
            cls_checkpoint=args.cls_checkpoint,
            loc_backbone=args.loc_backbone,
            cls_backbone=args.cls_backbone,
            config=StudyPipelineConfig(
                crop_mode=args.crop_mode, padded_hw=padded_hw
            ),
        )
        results = pipeline.run(studies, fetch_crops=False)
        payload = [
            {
                "study_id": r.study_id,
                "coords": r.coords.tolist(),
                "predictions": {k: v.tolist() for k, v in r.predictions.items()},
                "probabilities": {
                    k: v.tolist() for k, v in r.probabilities.items()
                },
            }
            for r in results
        ]
        text = json.dumps(payload, indent=2)
        if args.output_json:
            from pathlib import Path as _Path

            out_path = _Path(args.output_json)
            out_path.parent.mkdir(parents=True, exist_ok=True)
            out_path.write_text(text)
            logger.info("Wrote predictions to %s", args.output_json)
        else:
            print(text)
        return 0

    if args.command == "serve":
        from pathlib import Path

        from spine_vision_tpu.infer import (
            StudyInferencePipeline,
            StudyPipelineConfig,
        )
        from spine_vision_tpu.infer.serve import serve_directory

        mesh = None
        if args.data_parallel:
            from spine_vision_tpu.parallel import data_parallel_mesh

            mesh = data_parallel_mesh()
            logger.info("Serving data-parallel over %d devices", mesh.size)
        pipeline = StudyInferencePipeline.from_checkpoints(
            loc_checkpoint=args.loc_checkpoint,
            cls_checkpoint=args.cls_checkpoint,
            loc_backbone=args.loc_backbone,
            cls_backbone=args.cls_backbone,
            config=StudyPipelineConfig(
                crop_mode=args.crop_mode, padded_hw=tuple(args.padded_hw)
            ),
            mesh=mesh,
        )
        stats = serve_directory(
            pipeline,
            Path(args.watch_dir),
            Path(args.output_dir),
            poll_interval=args.poll_interval,
            max_batch=args.max_batch,
            once=args.once,
        )
        logger.info(
            "Serve loop done: %d processed, %d failed, %d batches",
            stats.processed, stats.failed, stats.batches,
        )
        return 0

    if args.command == "convert":
        from pathlib import Path

        from spine_vision_tpu.models.convert import convert_checkpoint

        convert_checkpoint(
            Path(args.checkpoint), args.arch, Path(args.output)
        )
        return 0

    if args.command == "bench":
        import runpy
        from pathlib import Path

        bench = Path(__file__).resolve().parents[2] / "bench.py"
        if not bench.exists():
            # Wheel installs don't carry the repo-root harness.
            parser.error(
                "bench.py not found (the benchmark harness lives at the "
                "repository root; run `spine-vision-tpu bench` from a "
                "source checkout)"
            )
        runpy.run_path(str(bench), run_name="__main__")
        return 0

    if args.command == "parity":
        import json
        from pathlib import Path

        from spine_vision_tpu.utils.parity import run_parity

        record = run_parity(
            Path(args.output_dir),
            seed=args.seed,
            norm_impl=args.norm_impl,
            pool_impl=args.pool_impl,
        )
        print(json.dumps(record, indent=2))
        return 0 if record["all_pass"] else 1

    if args.command == "train-ocr":
        import json
        from pathlib import Path

        from spine_vision_tpu.train.ocr import train_ocr_stack

        metrics = train_ocr_stack(
            output_dir=Path(args.output_dir) if args.output_dir else None,
            recognizer_steps=args.recognizer_steps,
            detector_steps=args.detector_steps,
            seed=args.seed,
        )
        print(json.dumps(metrics, indent=2))
        return 0

    parser.error(f"Unknown command: {args.command}")
    return 2


def main() -> None:  # console_scripts target
    sys.exit(cli())
