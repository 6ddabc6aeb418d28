"""Simulation constants and static configuration.

Mirrors the reference's tuning constants (reference: include/solver2d/constants.h:6-22)
and the testbed defaults (reference: samples/settings.h:16-24). The SimConfig is a
hashable frozen dataclass used as a *static* argument to the jitted step function,
so solver type / iteration counts / capacities specialize the compiled kernel.
"""

from __future__ import annotations

import dataclasses
import enum

# --- Physical/tuning constants (reference: include/solver2d/constants.h) ---
PI = 3.14159265359
LINEAR_SLOP = 0.005
SPECULATIVE_DISTANCE = 4.0 * LINEAR_SLOP
AABB_MARGIN = 0.1
ANGULAR_SLOP = 2.0 / 180.0 * PI
MAX_POLYGON_VERTICES = 8
MAX_LINEAR_CORRECTION = 0.2
MAX_ANGULAR_CORRECTION = 8.0 / 180.0 * PI
BAUMGARTE = 0.2
HUGE = 100000.0
MAX_BAUMGARTE_VELOCITY = 4.0
CONTACT_HERTZ = 30.0
JOINT_HERTZ = 60.0

# Soft-constraint damping ratio (reference: src/solve_common.c:266)
CONTACT_ZETA = 10.0


class SolverType(enum.IntEnum):
    """The ten solver algorithms (reference: include/solver2d/types.h:75-88)."""

    JACOBI = 0
    PGS = 1
    PGS_NGS = 2
    PGS_NGS_BLOCK = 3  # reference default (types.h:95-97)
    PGS_SOFT = 4
    SOFT_STEP = 5
    TGS_STICKY = 6
    TGS_SOFT = 7
    TGS_NGS = 8
    XPBD = 9


# Solvers that sub-step: h = dt / iterations (reference: src/world.c:186-199)
SUBSTEPPING_SOLVERS = frozenset(
    {
        SolverType.XPBD,
        SolverType.TGS_SOFT,
        SolverType.TGS_STICKY,
        SolverType.TGS_NGS,
        SolverType.SOFT_STEP,
    }
)

# Solvers whose contact sweeps support the color-bucketed solve
# (SimConfig.contact_bucket_cap): the shared gs/ngs passes, XPBD's
# position/velocity projections, and the block solver (its prepared extras
# are elementwise over cons rows, so they inherit the bucketed layout).
# Sticky couples slot-order friction anchors through prepare_sticky and
# Jacobi solves the whole table at once — those two take the dense contact
# path (joints bucket for all solvers).
BUCKETABLE_SOLVERS = frozenset(
    {
        SolverType.PGS,
        SolverType.PGS_NGS,
        SolverType.PGS_SOFT,
        SolverType.SOFT_STEP,
        SolverType.TGS_SOFT,
        SolverType.TGS_NGS,
        SolverType.XPBD,
        SolverType.PGS_NGS_BLOCK,
    }
)

# Solvers implemented by the lane-batched solve (SimConfig.lane_solve,
# solvers/lane_solve.py): the soft family whose contact sweeps are the shared
# gs passes over prepared soft constraints.
LANE_SOLVERS = frozenset(
    {
        SolverType.PGS_SOFT,
        SolverType.SOFT_STEP,
        SolverType.TGS_SOFT,
    }
)


class BodyType(enum.IntEnum):
    """reference: include/solver2d/types.h:99-105"""

    STATIC = 0
    KINEMATIC = 1
    DYNAMIC = 2


class ShapeType(enum.IntEnum):
    """Original user-facing shape type. Internally every shape is stored as a
    rounded convex polygon (circle = 1 vertex, capsule/segment = 2 vertices),
    the same funneling trick the reference uses for capsules/segments
    (reference: src/manifold.c:224-245)."""

    CIRCLE = 0
    CAPSULE = 1
    POLYGON = 2
    SEGMENT = 3


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static (compile-time) simulation configuration.

    Defaults mirror the testbed (reference: samples/settings.h:16-24): 4 primary
    iterations, 2 extra (relax/position) iterations, warm starting on.
    """

    solver: SolverType = SolverType.PGS_NGS_BLOCK
    iterations: int = 4          # velocity iterations, or substeps for substepping solvers
    extra_iterations: int = 2    # relax / position iterations
    warm_start: bool = True

    # Capacities (static shapes for XLA). Scene builders size these.
    max_bodies: int = 128
    max_shapes: int = 128
    max_contacts: int = 512
    max_joints: int = 16

    # Broadphase: 'grid' (hashed uniform grid — scales to dense stacked
    # scenes) or 'sap' (sweep-and-prune window — fine for small/sparse
    # scenes). Overflow of either is reported in diagnostics.
    broadphase: str = "grid"
    sap_window: int = 16
    grid_cell: float = 1.5       # cell size; freeze() auto-sizes from shapes
    cell_capacity: int = 8       # max small shapes per cell
    max_big_shapes: int = 16     # shapes larger than a cell (grounds, ramps)

    # GJK support-call budget per narrowphase pair (reference uses 20,
    # src/distance.c:504; early termination is masked, so this is the actual
    # trip count — 8-12 converges for <=8-vertex shapes and is ~35% faster).
    gjk_iters: int = 20

    # Narrowphase implementation: 'xla' (vmapped per-pair kernel), 'lanes'
    # (lane-major rank-2 rewrite, plain XLA — fastest measured on chip), or
    # 'pallas' (the lane-major kernel fused into one Pallas program per
    # world — measured ~4% slower than 'lanes' at 64 worlds x 211 bodies).
    # All three compute identical math (ops/narrow_lanes.py mirrors
    # ops/manifold.py operation-for-operation).
    narrowphase: str = "xla"

    # Fused Pallas solver: run the entire TGS_Soft/SoftStep/PGS_Soft substep
    # loop — including soft revolute + mouse joints — in one VMEM-resident
    # TPU kernel (solvers/pallas_solver.py). VMEM gate: the compiler's
    # scoped allocation is ~6x our
    # two persistent [C,B] incidence matrices (Mosaic matmul transpose
    # buffers + loop temporaries; measured 23.57 MiB at B*C=193K,
    # exp/pallas_vmem_probe.py), so pallas_solver.py raises vmem_limit_bytes
    # to 100 MiB (of 128 MiB physical on v5e) and world.py:freeze gates
    # max_bodies*max_contacts at 2^18.
    use_pallas_solver: bool = False

    # Graph coloring: number of independent constraint batches for the
    # Gauss-Seidel sweeps. Contacts left uncolored after MAX_COLORS-1 rounds
    # land in the final bucket which may have conflicts (solved Jacobi-like);
    # the overflow count is reported in diagnostics.
    max_colors: int = 16
    joint_max_colors: int = 8

    # Color-bucketed solve (> 0 enables): permute prepared contact
    # constraints into color-major buckets of this static per-color capacity
    # once per step, so each unrolled solve phase slices only its own
    # ~C/max_colors rows instead of re-solving all C with a color mask — the
    # dense path costs max_colors x redundant math and row-gather traffic per
    # sweep. Only effective for BUCKETABLE_SOLVERS with incremental coloring
    # (capacity-aware color assignment keeps every color within cap; over-cap
    # stragglers skip one step, recolor, and count in diag.color_overflow).
    # Sizing: cap * max_colors should comfortably exceed the live contact
    # count; world.freeze(contact_bucket_cap=-1) auto-sizes.
    contact_bucket_cap: int = 0
    # Same for joints (all solvers — every joint sweep routes through the
    # shared jk passes; Joint Grid's 19.8k joints x joint_max_colors dense
    # sweeps are the analog redundancy).
    joint_bucket_cap: int = 0

    # Statically skip every CONTACT solve phase — the mirror of solve_joints
    # for contact-free scenes (the reference pays zero for zero contacts;
    # our static pipeline pays max_colors serialized phases per sweep, each
    # with a [B]-row gather_apply — at Joint Grid's 10k bodies that is most
    # of the step). Broadphase/narrowphase still run, so diag.contact_count
    # reveals if contacts ever appear in a scene that opted in (they would
    # be ignored — only use for scenes that stay contact-free, e.g. the
    # reference's joint samples where jointed-pair filtering already drops
    # every candidate pair, sample_joints.cpp:365-457).
    solve_contacts: bool = True

    # Statically skip every joint solve phase. The reference's joint loops
    # cost zero for zero joints (they iterate a count), but our static-shape
    # pipeline pays joint_max_colors serialized phases per sweep — each with
    # a full [B]-row gather_apply — even for an empty 8-slot joint table.
    # Joint-free perf scenes (the north-star pyramid) opt in via
    # world.freeze(solve_joints=False); freeze asserts the scene has no live
    # joints. NOTE: a runtime-attached mouse joint (queries.attach_mouse_joint)
    # is solved only when this is True, which is why it is not auto-derived —
    # the interactive testbed drags contact-only scenes.
    solve_joints: bool = True

    # Lane-batched solve (solvers/lane_solve.py, used by parallel.step_batch):
    # share the constraint STRUCTURE (colors, buckets, body map) across a
    # lockstep world batch and put worlds in the minor (lane) dimension —
    # body state becomes [B, W*8] and every solve-phase row-gather carries
    # all W worlds in one row. TPU row-gathers cost ~constant per ROW, so
    # the per-world path pays rows x W per phase while this pays rows x 1
    # (measured: solve was ~85% of the north-star step). Structure comes
    # from world 0; worlds whose contact at a slot has diverged from world
    # 0's pair are masked out of that constraint for the step and counted in
    # diag.color_overflow (lockstep batches — the replicate_state contract —
    # never diverge). Requires a bucketed solver config; contacts only
    # (freeze asserts solve_joints=False).
    lane_solve: bool = False

    # Persistent incremental coloring (ops/coloring.py:assign_colors): colors
    # ride the contact/joint state across steps; only new constraints pay
    # `color_rounds` first-fit rounds. Steady-state coloring cost is one
    # validation pass instead of (max_colors-1) x 4 MIS rounds over a dense
    # [B, N] incidence matrix. Constraints still uncolored after the rounds
    # are skipped for one step (counted in diag.color_overflow) and retry next
    # step. Requires max_colors <= 30. Off = the original per-step MIS.
    incremental_coloring: bool = True
    color_rounds: int = 8

    def substepping(self) -> bool:
        return self.solver in SUBSTEPPING_SOLVERS

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)
