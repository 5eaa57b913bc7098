"""Parameter checkpointing via Orbax (TensorStore-backed).

The reference's weights live in torch checkpoint files loaded by
sentence-transformers; here converted params persist either as flat .npz
(`models.convert.save_params_npz`, portable) or as an Orbax checkpoint
(sharded, resumable, the ecosystem standard — used for large TP-sharded
encoders where a single npz is impractical).
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional


def save_params_orbax(path, params: Dict) -> None:
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params_orbax(path, template: Optional[Dict] = None) -> Dict:
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        import jax

        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
