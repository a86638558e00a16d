"""Small boolean/config helpers (parity: reference ``dctn/utils.py:20-30``)."""

from __future__ import annotations

import dataclasses
from typing import Union


def implies(x: bool, y: bool) -> bool:
    return (not x) or y


def xor(*args: bool) -> bool:
    result = False
    for a in args:
        result = result != bool(a)
    return result


def exactly_one_true(*args: bool) -> bool:
    if not all(isinstance(a, bool) for a in args):
        raise TypeError("exactly_one_true expects bools")
    return sum(args) == 1


# Value types describing how to initialize a single tensor
# (parity: reference ``dctn/utils.py:33-50``).


@dataclasses.dataclass(frozen=True)
class ZeroCenteredNormalInit:
    std: float


@dataclasses.dataclass(frozen=True)
class ZeroCenteredUniformInit:
    maximum: float


@dataclasses.dataclass(frozen=True)
class FromFileInit:
    path: str


OneTensorInit = Union[ZeroCenteredNormalInit, ZeroCenteredUniformInit, FromFileInit]
