"""Parse training ``log.log`` eval lines back into records.

Parity: reference ``dctn/visualization/log_parsing.py`` — the eval-line
pattern is the contract between the runner's logging and this parser (and the
plotting layer above it).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Iterable, Optional, Tuple, TypeVar

T = TypeVar("T")

_PATTERN = re.compile(
    r"After (?P<nitd>\d+) iters: "
    r"train/val mean_ce=(?P<trmce>\d+\.\d+)/(?P<vmce>\d+\.\d+) "
    r"acc=(?P<tracc>\d+\.\d+)%/(?P<vacc>\d+\.\d+)"
)


@dataclasses.dataclass(frozen=True)
class Record:
    nitd: int
    trmce: float
    vmce: float
    tracc: float
    vacc: float


def get_increasing_subsequence(
    xs: Iterable[T], calc_key: Callable[[T], Any] = lambda x: x
) -> Iterable[T]:
    """Yield elements forming the greedy increasing subsequence by key."""
    iterator = iter(xs)
    try:
        x = next(iterator)
    except StopIteration:
        return
    max_key = calc_key(x)
    yield x
    for x in iterator:
        key = calc_key(x)
        if key > max_key:
            max_key = key
            yield x


def maybe_extract_record(line: str) -> Optional[Record]:
    match = _PATTERN.search(line)
    if not match:
        return None
    return Record(
        nitd=int(match["nitd"]),
        trmce=float(match["trmce"]),
        vmce=float(match["vmce"]),
        tracc=float(match["tracc"]) / 100.0,
        vacc=float(match["vacc"]) / 100.0,
    )


def load_records(log_fname: str, increasing_tracc: bool = False) -> Tuple[Record, ...]:
    with open(log_fname, encoding="utf-8") as f:
        lines = f.readlines()
    records: Iterable[Record] = (
        r for line in lines if (r := maybe_extract_record(line)) is not None
    )
    if increasing_tracc:
        records = get_increasing_subsequence(records, lambda r: r.tracc)
    return tuple(records)
