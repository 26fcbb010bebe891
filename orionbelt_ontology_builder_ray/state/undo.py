"""Undo/redo for driver-side stores + versioned Parquet checkpoints.

``UndoManager`` mirrors the reference's in-RAM snapshot stack
(ontology_manager.py:2904-2963) for schema-plane editing.  The data
plane's durability analog — versioned Parquet snapshot dirs with
lineage manifests — lives in ``pipelines.checkpoint``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .graph import TripleStore


class UndoManager:
    def __init__(self, store: TripleStore, max_history: int = 50):
        self.store = store
        self.max_history = max_history
        self._undo_stack: List[Tuple[str, bytes]] = [
            ("Initial state", store.take_snapshot())]
        self._redo_stack: List[Tuple[str, bytes]] = []

    def checkpoint(self, label: str = "Edit") -> None:
        self._undo_stack.append((label, self.store.take_snapshot()))
        if len(self._undo_stack) > self.max_history:
            self._undo_stack.pop(0)
        self._redo_stack.clear()

    def can_undo(self) -> bool:
        return len(self._undo_stack) > 1

    def can_redo(self) -> bool:
        return bool(self._redo_stack)

    def undo(self) -> Optional[str]:
        if not self.can_undo():
            return None
        self._redo_stack.append(self._undo_stack.pop())
        label, snapshot = self._undo_stack[-1]
        self.store.restore_snapshot(snapshot)
        return label

    def redo(self) -> Optional[str]:
        if not self.can_redo():
            return None
        label, snapshot = self._redo_stack.pop()
        self._undo_stack.append((label, snapshot))
        self.store.restore_snapshot(snapshot)
        return label

    @property
    def undo_labels(self) -> List[str]:
        return [label for label, _ in self._undo_stack[1:]]

    @property
    def redo_labels(self) -> List[str]:
        return [label for label, _ in self._redo_stack]
