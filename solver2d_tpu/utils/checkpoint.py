"""Checkpoint / resume.

The reference persists only UI settings (reference: samples/settings.cpp:42-121);
world state itself is a pure pytree here, so checkpointing is exact and
deterministic resume is trivial. Two backends: flat .npz (zero deps) and
orbax (for fleets / async checkpointing of many-world batches).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..state import Bodies, Contacts, Diagnostics, Joints, Shapes, State


def _flatten(state: State) -> dict:
    flat = {}
    for group in ("bodies", "shapes", "contacts", "joints", "diag"):
        obj = getattr(state, group)
        for f in dataclasses.fields(obj):
            flat[f"{group}.{f.name}"] = np.asarray(getattr(obj, f.name))
    flat["gravity"] = np.asarray(state.gravity)
    return flat


def save_npz(path: str, state: State):
    np.savez_compressed(path, **_flatten(state))


def load_npz(path: str) -> State:
    import jax.numpy as jnp

    data = np.load(path)

    def group(cls, name):
        kw = {}
        for f in dataclasses.fields(cls):
            kw[f.name] = jnp.asarray(data[f"{name}.{f.name}"])
        return cls(**kw)

    return State(
        bodies=group(Bodies, "bodies"),
        shapes=group(Shapes, "shapes"),
        contacts=group(Contacts, "contacts"),
        joints=group(Joints, "joints"),
        gravity=jax.numpy.asarray(data["gravity"]),
        diag=group(Diagnostics, "diag"),
    )


def save_orbax(path: str, state: State):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def load_orbax(path: str, template: State) -> State:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
