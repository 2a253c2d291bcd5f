"""k2-style symbol<->id table with file (de)serialization.

Parity: ref /root/reference/valle/utils/symbol_table.py:31-287 — plain-text
format of ``<symbol> <id>`` per line, ``<eps>`` id 0 by default.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Generic, List, Optional, TypeVar, Union

Symbol = TypeVar("Symbol")


@dataclasses.dataclass
class SymbolTable(Generic[Symbol]):
    _id2sym: Dict[int, Symbol] = dataclasses.field(default_factory=dict)
    _sym2id: Dict[Symbol, int] = dataclasses.field(default_factory=dict)
    _next_available_id: int = 1
    eps: Symbol = "<eps>"

    def __post_init__(self):
        for idx, sym in self._id2sym.items():
            assert self._sym2id[sym] == idx
        self._next_available_id = max(self._id2sym, default=0) + 1
        if self.eps:
            self._id2sym.setdefault(0, self.eps)
            self._sym2id.setdefault(self.eps, 0)

    @staticmethod
    def from_str(s: str) -> "SymbolTable":
        id2sym: Dict[int, str] = {}
        sym2id: Dict[str, int] = {}
        for line in s.split("\n"):
            fields = line.split()
            if len(fields) == 0:
                continue
            if len(fields) != 2:
                raise ValueError(f"Expect a line with 2 fields. Given: {line}")
            sym, idx = fields[0], int(fields[1])
            if sym in sym2id:
                raise RuntimeError(f"Duplicated symbol {sym}")
            if idx in id2sym:
                raise RuntimeError(f"Duplicated id {idx}")
            id2sym[idx] = sym
            sym2id[sym] = idx
        eps = id2sym.get(0, "<eps>")
        return SymbolTable(_id2sym=id2sym, _sym2id=sym2id, eps=eps)

    @staticmethod
    def from_file(filename: Union[str, Path]) -> "SymbolTable":
        with open(filename, "r", encoding="utf-8") as f:
            return SymbolTable.from_str(f.read().strip())

    def to_str(self) -> str:
        return "\n".join(f"{sym} {idx}" for idx, sym in sorted(self._id2sym.items()))

    def to_file(self, filename: Union[str, Path]) -> None:
        with open(filename, "w", encoding="utf-8") as f:
            for idx, symbol in sorted(self._id2sym.items()):
                print(symbol, idx, file=f)

    def add(self, symbol: Symbol, index: Optional[int] = None) -> int:
        if symbol in self._sym2id:
            return self._sym2id[symbol]
        if index is not None and index in self._id2sym:
            raise ValueError(f"id {index} is occupied")
        if index is None:
            index = self._next_available_id
        self._id2sym[index] = symbol
        self._sym2id[symbol] = index
        self._next_available_id = max(self._next_available_id, index + 1)
        return index

    def get(self, k: Union[int, Symbol]) -> Union[Symbol, int]:
        if isinstance(k, int):
            return self._id2sym[k]
        return self._sym2id[k]

    def merge(self, other: "SymbolTable") -> "SymbolTable":
        self._check_compatible(other)
        id2sym = dict(self._id2sym)
        sym2id = dict(self._sym2id)
        for idx, sym in other._id2sym.items():
            id2sym.setdefault(idx, sym)
        for sym, idx in other._sym2id.items():
            sym2id.setdefault(sym, idx)
        return SymbolTable(_id2sym=id2sym, _sym2id=sym2id, eps=self.eps)

    def _check_compatible(self, other: "SymbolTable") -> None:
        assert self.eps == other.eps, "mismatched epsilon"
        for idx in set(self._id2sym) & set(other._id2sym):
            assert self._id2sym[idx] == other._id2sym[idx], idx
        for sym in set(self._sym2id) & set(other._sym2id):
            assert self._sym2id[sym] == other._sym2id[sym], sym

    @property
    def ids(self) -> List[int]:
        return sorted(self._id2sym)

    @property
    def symbols(self) -> List[Symbol]:
        return sorted(self._sym2id.keys())

    def __contains__(self, item) -> bool:
        if isinstance(item, int):
            return item in self._id2sym
        return item in self._sym2id

    def __len__(self) -> int:
        return len(self._id2sym)

    def __getitem__(self, item):
        return self.get(item)
