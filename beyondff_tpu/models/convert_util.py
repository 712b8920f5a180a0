"""Shared helpers for checkpoint converters: key-consumption accounting.

Every converter must account for 100% of a checkpoint's keys — either mapped
into the flax tree or matched by an explicit, documented ignore pattern.
Silent leftovers are how wrong key maps ship (round-1 verdict), so leftovers
raise with the full diagnosable list.
"""

from __future__ import annotations

import re
from typing import Iterable


class ConversionError(RuntimeError):
    pass


class RecordingDict:
    """Dict wrapper recording which keys a converter consumed."""

    def __init__(self, data: dict):
        self.data = dict(data)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return self.data[key]

    def __contains__(self, key):
        return key in self.data

    def get(self, key, default=None):
        if key in self.data:
            return self[key]
        return default

    def keys(self):
        return self.data.keys()

    def items(self):
        return self.data.items()

    def __len__(self):
        return len(self.data)

    def unconsumed(self, ignore: Iterable[str] = ()) -> list:
        pats = [re.compile(p) for p in ignore]
        return sorted(
            k for k in self.data
            if k not in self.consumed and not any(p.search(k) for p in pats)
        )


def assert_all_consumed(rd: RecordingDict, ignore: Iterable[str] = (),
                        context: str = "checkpoint") -> None:
    left = rd.unconsumed(ignore)
    if left:
        raise ConversionError(
            f"{context}: {len(left)} keys not consumed by the converter "
            f"(first 20): {left[:20]}"
        )
