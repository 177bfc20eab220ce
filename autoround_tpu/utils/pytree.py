"""Dotted-path access into nested param pytrees (dicts + lists).

Lets layer names address nested structures — ``experts.3.w1`` inside a
MoE block — the role the reference's ``get_module``/``set_module``
(``utils/model.py``) plays for torch module trees.
"""

from __future__ import annotations

from typing import Any

__all__ = ["get_by_path", "set_by_path", "has_path"]


def get_by_path(tree: Any, path: str) -> Any:
    node = tree
    for p in path.split("."):
        node = node[int(p)] if isinstance(node, (list, tuple)) else node[p]
    return node


def set_by_path(tree: Any, path: str, value: Any) -> Any:
    """Functional set: returns a copy of ``tree`` with ``path`` replaced
    (shares unmodified branches)."""
    parts = path.split(".")

    def rec(node, i):
        if i == len(parts):
            return value
        p = parts[i]
        if isinstance(node, list):
            idx = int(p)
            new = list(node)
            new[idx] = rec(node[idx], i + 1)
            return new
        if isinstance(node, tuple):
            idx = int(p)
            new = list(node)
            new[idx] = rec(node[idx], i + 1)
            return tuple(new)
        new = dict(node)
        # a missing FINAL key is created (loading packed checkpoints whose
        # dense copies were dropped); missing intermediates stay errors
        new[p] = rec(node.get(p) if i == len(parts) - 1 else node[p], i + 1)
        return new

    return rec(tree, 0)


def has_path(tree: Any, path: str) -> bool:
    try:
        get_by_path(tree, path)
        return True
    except (KeyError, IndexError, TypeError, ValueError):
        return False
