"""Model checkpoint save/restore (orbax-backed).

The reference is a stateless per-frame library with no checkpointing
(SURVEY.md §5 — its nearest analog is stream seek); this utility covers
the framework's own stateful side: bundled-model parameters and optimizer
state for the dp×tp training path.
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (e.g. {'variables': …, 'opt_state': …}) to ``path``."""
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(p, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``like``: optional abstract target (same structure/shapes/shardings)
    — required to restore with non-default shardings on a mesh.
    """
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct
            if hasattr(ocp.utils, "to_shape_dtype_struct")
            else (lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)),
            like,
        )
        return ckptr.restore(p, target)
    return ckptr.restore(p)
