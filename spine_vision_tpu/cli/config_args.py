"""Pydantic-config -> argparse rendering.

The reference renders its pydantic configs to a CLI with tyro
(cli/__init__.py:33-97); tyro is not bundled here, so this module walks
``model_fields`` and emits equivalent argparse options: booleans get
--flag/--no-flag pairs, tuples become fixed-arity nargs, lists variadic
nargs, Literals become choices, and Optionals parse their inner type.
"""

from __future__ import annotations

import argparse
import typing
from pathlib import Path
from typing import Any, Literal, Union

from pydantic import BaseModel


def _unwrap_optional(annotation: Any) -> tuple[Any, bool]:
    """Optional[X] -> (X, True); anything else -> (annotation, False)."""
    origin = typing.get_origin(annotation)
    if origin is Union or origin is getattr(__import__("types"), "UnionType", None):
        args = [a for a in typing.get_args(annotation) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return annotation, False


def _scalar_parser(annotation: Any) -> Any:
    if annotation is Path:
        return Path
    if annotation in (int, float, str):
        return annotation
    return str


def add_config_args(
    parser: argparse.ArgumentParser,
    config_cls: type[BaseModel],
    skip: set[str] | None = None,
) -> None:
    """Add one argparse option per (non-computed) config field."""
    skip = skip or set()
    aliases: dict[str, list[str]] = getattr(config_cls, "cli_aliases", {})

    for name, field in config_cls.model_fields.items():
        if name in skip:
            continue
        flag = "--" + name.replace("_", "-")
        names = aliases.get(name, []) + [flag]
        annotation, _ = _unwrap_optional(field.annotation)
        origin = typing.get_origin(annotation)
        help_text = field.description or ""
        default = field.get_default(call_default_factory=True)

        if annotation is bool:
            parser.add_argument(
                *names,
                action=argparse.BooleanOptionalAction,
                default=default,
                help=help_text,
            )
        elif origin is Literal:
            parser.add_argument(
                *names,
                choices=list(typing.get_args(annotation)),
                default=default,
                help=help_text,
            )
        elif origin is tuple:
            args = typing.get_args(annotation)
            if len(args) == 2 and args[1] is Ellipsis:
                parser.add_argument(
                    *names,
                    nargs="*",
                    type=_scalar_parser(args[0]),
                    default=default,
                    help=help_text,
                )
            else:
                parser.add_argument(
                    *names,
                    nargs=len(args),
                    type=_scalar_parser(args[0]),
                    default=default,
                    help=help_text,
                )
        elif origin is list:
            (elem,) = typing.get_args(annotation) or (str,)
            parser.add_argument(
                *names,
                nargs="*",
                type=_scalar_parser(elem),
                default=default,
                help=help_text,
            )
        else:
            parser.add_argument(
                *names,
                type=_scalar_parser(annotation),
                default=default,
                help=help_text,
            )


def config_from_args(
    config_cls: type[BaseModel],
    args: argparse.Namespace,
    overrides: dict[str, Any] | None = None,
) -> Any:
    """Instantiate a config from parsed args (tuple fields re-tupled)."""
    values: dict[str, Any] = {}
    for name, field in config_cls.model_fields.items():
        if not hasattr(args, name):
            continue
        value = getattr(args, name)
        annotation, _ = _unwrap_optional(field.annotation)
        if typing.get_origin(annotation) is tuple and isinstance(value, list):
            value = tuple(value)
        values[name] = value
    if overrides:
        values.update(overrides)
    return config_cls(**values)
