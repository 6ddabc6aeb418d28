"""solver2d-tpu: a TPU-native 2D rigid-body solver-comparison framework.

Built from scratch in JAX (XLA/Pallas/pjit) with the capabilities of
erincatto/solver2d: ten constraint-solver algorithms on an identical scene
catalog, batched over worlds and sharded across TPU meshes.
"""

from .config import (  # noqa: F401
    BodyType,
    ShapeType,
    SimConfig,
    SolverType,
)
from .state import Bodies, Contacts, Diagnostics, Joints, Shapes, State  # noqa: F401
from .world import BodyDef, ShapeDef, World  # noqa: F401

__version__ = "0.1.0"
