"""CLI: pydantic->argparse rendering and parser wiring."""

import argparse
from pathlib import Path
from typing import Literal

import pytest
from pydantic import BaseModel

from spine_vision_tpu.cli import _build_parser
from spine_vision_tpu.cli.config_args import add_config_args, config_from_args


class _DemoConfig(BaseModel):
    name: str = "x"
    count: int = 3
    rate: float = 0.5
    path: Path = Path("data")
    flag: bool = True
    maybe: int | None = None
    pair: tuple[int, int] = (4, 5)
    mode: Literal["a", "b"] = "a"
    items: list[str] = []


def _parse(args):
    parser = argparse.ArgumentParser()
    add_config_args(parser, _DemoConfig)
    return parser.parse_args(args)


def test_defaults_roundtrip():
    config = config_from_args(_DemoConfig, _parse([]))
    assert config == _DemoConfig()


def test_all_field_kinds():
    namespace = _parse(
        [
            "--name", "y", "--count", "7", "--rate", "0.25",
            "--path", "/tmp/z", "--no-flag", "--maybe", "9",
            "--pair", "1", "2", "--mode", "b", "--items", "p", "q",
        ]
    )
    config = config_from_args(_DemoConfig, namespace)
    assert config.name == "y" and config.count == 7
    assert config.rate == 0.25 and config.path == Path("/tmp/z")
    assert config.flag is False and config.maybe == 9
    assert config.pair == (1, 2)  # re-tupled from argparse list
    assert config.mode == "b" and config.items == ["p", "q"]


def test_literal_rejects_bad_choice(capsys):
    with pytest.raises(SystemExit):
        _parse(["--mode", "z"])


def test_tuple_arity_enforced(capsys):
    with pytest.raises(SystemExit):
        _parse(["--pair", "1"])


def test_full_parser_builds_and_routes():
    parser = _build_parser()
    args = parser.parse_args(
        ["train", "localization", "--batch-size", "4", "--no-augment"]
    )
    assert args.command == "train" and args.subcommand == "localization"
    assert args.batch_size == 4 and args.augment is False

    args = parser.parse_args(
        ["infer", "--loc-checkpoint", "a", "--cls-checkpoint", "b",
         "--t1", "x.mha", "--t2", "y.mha", "--padded-hw", "1536", "1536"]
    )
    assert args.command == "infer" and args.padded_hw == [1536, 1536]

    with pytest.raises(SystemExit):
        parser.parse_args(["bogus"])
