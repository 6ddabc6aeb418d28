"""Debug draw: headless renderer reproducing the testbed's layers.

Implements the s2DebugDraw surface (reference: include/solver2d/debug_draw.h:9-55,
src/world.c:308-563) on matplotlib: shapes per solver color, joints, AABBs,
contact points/normals/impulses — and the testbed's signature overlay of the
same scene under multiple solvers in different colors
(reference: samples/main.cpp:689-711)."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import ShapeType
from ..state import State

# per-solver colors (reference: samples/main.cpp:689-703 color legend)
SOLVER_COLORS = [
    "#e6194B", "#3cb44b", "#ffe119", "#4363d8", "#f58231",
    "#911eb4", "#42d4f4", "#f032e6", "#bfef45", "#fabed4",
]


@dataclasses.dataclass
class DrawOptions:
    """reference: debug_draw.h:45-54 toggles"""

    draw_shapes: bool = True
    draw_joints: bool = True
    draw_aabbs: bool = False
    draw_contact_points: bool = False
    draw_contact_normals: bool = False
    draw_contact_impulses: bool = False


def _rot(q):
    s, c = q
    return np.array([[c, -s], [s, c]])


def draw_world(ax, state: State, color="#4363d8", alpha=0.9, options: DrawOptions | None = None):
    """Draw one world's live shapes onto a matplotlib axis."""
    from matplotlib.patches import Circle as MplCircle, Polygon as MplPolygon

    options = options or DrawOptions()
    s = state
    shapes = s.shapes
    bodies = s.bodies
    alive = np.asarray(shapes.alive)
    body = np.asarray(shapes.body)
    verts = np.asarray(shapes.verts)
    counts = np.asarray(shapes.count)
    radius = np.asarray(shapes.radius)
    origin = np.asarray(bodies.origin)
    rot = np.asarray(bodies.rot)

    if options.draw_shapes:
        for i in np.nonzero(alive)[0]:
            b = body[i]
            R = _rot(rot[b])
            world = verts[i, : counts[i]] @ R.T + origin[b]
            if counts[i] == 1:
                ax.add_patch(MplCircle(world[0], radius[i], fill=False, ec=color, alpha=alpha, lw=1.0))
            elif counts[i] == 2:
                p1, p2 = world
                ax.plot(*zip(p1, p2), color=color, alpha=alpha, lw=1.0)
                if radius[i] > 0:
                    ax.add_patch(MplCircle(p1, radius[i], fill=False, ec=color, alpha=0.5 * alpha, lw=0.7))
                    ax.add_patch(MplCircle(p2, radius[i], fill=False, ec=color, alpha=0.5 * alpha, lw=0.7))
            else:
                ax.add_patch(MplPolygon(world, closed=True, fill=False, ec=color, alpha=alpha, lw=1.0))

    if options.draw_joints:
        j = s.joints
        jalive = np.asarray(j.alive)
        for i in np.nonzero(jalive)[0]:
            ia, ib = int(j.body_a[i]), int(j.body_b[i])
            pa = origin[ia] + _rot(rot[ia]) @ np.asarray(j.local_anchor_a[i])
            pb = origin[ib] + _rot(rot[ib]) @ np.asarray(j.local_anchor_b[i])
            ax.plot(*zip(pa, pb), color="#80cccc", lw=0.8, alpha=alpha)

    if options.draw_aabbs:
        fat = np.asarray(shapes.fat_aabb)
        for i in np.nonzero(alive)[0]:
            lo_x, lo_y, hi_x, hi_y = fat[i]
            ax.plot(
                [lo_x, hi_x, hi_x, lo_x, lo_x], [lo_y, lo_y, hi_y, hi_y, lo_y],
                color="#00cc00", lw=0.4, alpha=0.5,
            )

    if options.draw_contact_points:
        con = s.contacts
        calive = np.asarray(con.alive) & (np.asarray(con.point_count) > 0)
        anchors = np.asarray(con.anchor_a)
        normals = np.asarray(con.normal)
        for i in np.nonzero(calive)[0]:
            ia = int(con.body_a[i])
            R = _rot(rot[ia])
            for jdx in range(int(con.point_count[i])):
                p = origin[ia] + R @ anchors[i, jdx]
                ax.plot([p[0]], [p[1]], marker="o", ms=2, color="#cc2222")
                if options.draw_contact_normals:
                    n = normals[i]
                    ax.plot([p[0], p[0] + 0.2 * n[0]], [p[1], p[1] + 0.2 * n[1]], color="#cccc22", lw=0.6)


def render_states(states: dict[str, State], path: str | None = None, options=None, bounds=None, title=None):
    """Overlay multiple solver runs of the same scene (the testbed's
    side-by-side visualization, reference: samples/main.cpp:705-711,806-813).

    states: {label: State}. Returns the matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 8))
    for k, (label, st) in enumerate(states.items()):
        draw_world(ax, st, color=SOLVER_COLORS[k % len(SOLVER_COLORS)], options=options)
        ax.plot([], [], color=SOLVER_COLORS[k % len(SOLVER_COLORS)], label=label)
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=7)
    if bounds is not None:
        ax.set_xlim(bounds[0], bounds[2])
        ax.set_ylim(bounds[1], bounds[3])
    else:
        ax.autoscale()
    if title:
        ax.set_title(title)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig
