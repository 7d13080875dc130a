"""Pytree key-path helpers shared across the package."""

from __future__ import annotations


def keypath_parts(path) -> tuple:
    """Stringify one tree_flatten_with_path key path, part per level.

    Handles every jax key kind: DictKey/GetAttrKey carry ``.key``/``.name``,
    SequenceKey carries ``.idx`` — dropping the latter (as a bare
    ``hasattr(p, 'key')`` filter does) collapses list-indexed entries into
    colliding names.
    """
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:  # pragma: no cover - future key kinds
            parts.append(str(p))
    return tuple(parts)


def keypath_name(path) -> str:
    """'/'-joined form of keypath_parts."""
    return "/".join(keypath_parts(path))
