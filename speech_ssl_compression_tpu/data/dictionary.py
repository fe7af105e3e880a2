"""Minimal fairseq-style Dictionary + LabelEncoder (replaces the reference's
external ``fairseq.data.Dictionary`` dependency, runner.py:25-34,200-206).

File format: one "symbol count" pair per line. Indices follow fairseq's
layout: <s>=0, <pad>=1, </s>=2, <unk>=3, then file entries in order.
"""

from __future__ import annotations

from typing import List

import numpy as np


class Dictionary:
    def __init__(self, symbols: List[str]):
        self.specials = ["<s>", "<pad>", "</s>", "<unk>"]
        self.symbols = self.specials + list(symbols)
        self.index = {s: i for i, s in enumerate(self.symbols)}

    @classmethod
    def load(cls, path: str) -> "Dictionary":
        symbols = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                symbols.append(line.split(" ")[0])
        return cls(symbols)

    def __len__(self):
        return len(self.symbols)

    def pad(self) -> int:
        return 1

    def eos(self) -> int:
        return 2

    def unk(self) -> int:
        return 3

    def encode_line(self, line: str, append_eos: bool = False,
                    add_if_not_exist: bool = False) -> np.ndarray:
        ids = [self.index.get(tok, self.unk()) for tok in line.split()]
        if append_eos:
            ids.append(self.eos())
        return np.array(ids, np.int64)


class LabelEncoder:
    """reference runner.py:25-34."""

    def __init__(self, dictionary: Dictionary):
        self.dictionary = dictionary

    def __call__(self, label: str) -> np.ndarray:
        return self.dictionary.encode_line(
            label, append_eos=False, add_if_not_exist=False
        )


def build_label_lookup(dictionary: Dictionary) -> np.ndarray:
    """Raw NONNEGATIVE cluster id -> dictionary index, honoring the dict
    file's symbol ORDER (the reference encodes via dictionary.encode_line;
    a fairseq frequency-sorted dict.km.txt permutes ids, so a hardcoded
    "+4" offset is only correct for numerically-ordered recipe dicts).

    Negative numeric symbols (e.g. a "-1" noise label) are excluded from
    the table — Python negative indexing would otherwise corrupt the
    highest cluster's entry — and resolve to <unk> like any other
    out-of-range id (callers guard raw < 0 / raw >= len(lut))."""
    numeric = [int(s) for s in dictionary.symbols[4:]
               if s.lstrip("-").isdigit()]
    nonneg = [x for x in numeric if x >= 0]
    hi = (max(nonneg) + 1) if nonneg else 0
    lut = np.full(max(hi, 1), dictionary.unk(), np.int32)
    for raw in nonneg:
        lut[raw] = dictionary.index[str(raw)]
    return lut
