"""Scene catalog — the reference's 24 samples as builders.

Mirrors the self-registering sample table (reference: samples/sample.h:72-85,
sample.cpp:159-173): `register_scene(category, name)` decorates a builder
`fn(solver) -> Scene`; `SCENES[(category, name)]` looks it up; `scene_names()`
lists them sorted by category/name like SortTests (samples/main.cpp:62-65).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from ..config import SimConfig, SolverType
from ..world import World


@dataclasses.dataclass
class Scene:
    """A built scene plus its runtime hooks.

    pre_step:  jittable state->state applied before each step (e.g. Rush's
               converging forces, samples/collection/sample_contact.cpp:631-650).
    on_step:   host callback (state, step_index) -> state | None for discrete
               events (e.g. Warm Start Energy's body destruction at step 120,
               sample_contact.cpp:101-110; Ragdoll Stress spawning).
    """

    world: World
    config_overrides: dict = dataclasses.field(default_factory=dict)
    pre_step: Optional[Callable] = None
    on_step: Optional[Callable] = None
    meta: dict = dataclasses.field(default_factory=dict)

    def freeze(self, **extra):
        return self.world.freeze(**{**self.config_overrides, **extra})


SCENES: dict[tuple[str, str], Callable[[SolverType], Scene]] = {}


def register_scene(category: str, name: str):
    def deco(fn):
        SCENES[(category, name)] = fn
        fn.scene_key = (category, name)
        return fn

    return deco


def scene_names():
    return sorted(SCENES.keys())


def build(category: str, name: str, solver: SolverType = SolverType.PGS_NGS_BLOCK) -> Scene:
    try:
        factory = SCENES[(category, name)]
    except KeyError:
        known = ", ".join(f"{c}/{n}" for c, n in scene_names())
        raise SystemExit(
            f"unknown scene '{category}/{name}'. Known scenes: {known}"
        ) from None
    return factory(solver)


from . import contact_scenes  # noqa: E402,F401
from . import far_scenes  # noqa: E402,F401
from . import joint_scenes  # noqa: E402,F401
