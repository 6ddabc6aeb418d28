"""Headless testbed CLI — the samples app without GLFW/ImGui.

Replaces reference: samples/main.cpp + sample.cpp: runs the SAME scene under
up to 10 solvers simultaneously (one world per solver, main.cpp:705-711),
steps them in lockstep, prints the per-solver stats overlay
(sample.cpp:144-156), and optionally renders the overlaid multi-solver frames
(draw.py reproduces the color legend).

Usage:
  python -m solver2d_tpu.testbed --list
  python -m solver2d_tpu.testbed "Contact/Pyramid" --solvers TGS_SOFT,PGS --steps 240
  python -m solver2d_tpu.testbed "Joints/Bridge" --solvers all --render out.png

Settings mirror samples/settings.h:16-24 defaults: 60 Hz, 4 primary
iterations, 2 secondary, warm starting on.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from .config import SimConfig, SolverType
from .models import SCENES, build, scene_names
from .step import make_step
from .utils.metrics import statistics


def run_scene(
    category: str,
    name: str,
    solvers: list[SolverType],
    steps: int = 240,
    hertz: float = 60.0,
    iterations: int = 4,
    extra_iterations: int = 2,
    warm_start: bool = True,
    multi_steps: int = 1,
    render: str | None = None,
    render_every: int = 0,
    draw_options=None,
    verbose: bool = True,
    bucket_cap: int = 0,
):
    dt = 1.0 / hertz if hertz > 0 else 0.0
    runs = {}
    for solver in solvers:
        scene = build(category, name, solver)
        state, cfg = scene.freeze(
            iterations=iterations, extra_iterations=extra_iterations, warm_start=warm_start,
            contact_bucket_cap=bucket_cap,
        )
        stepf = make_step(cfg)
        runs[solver] = dict(scene=scene, state=state, cfg=cfg, stepf=stepf, ms=0.0)

    gif = bool(render) and render.endswith(".gif")
    frames = []
    for i in range(steps):
        for solver, r in runs.items():
            state = r["state"]
            scene = r["scene"]
            if scene.pre_step is not None:
                state = scene.pre_step(state)
            if scene.on_step is not None:
                new = scene.on_step(state, i)
                if new is not None:
                    state = new
            t0 = time.perf_counter()
            # multi_steps world-steps per frame (reference: samples/sample.cpp:130-137)
            for _ in range(multi_steps):
                state = r["stepf"](state, dt)
            state.bodies.position.block_until_ready()
            r["ms"] += 1e3 * (time.perf_counter() - t0)
            r["state"] = state
        if render and render_every and (i + 1) % render_every == 0:
            fp = f"{render}.{i+1:05d}.png"
            _render(runs, fp, f"{category}/{name} step {i+1}", draw_options)
            frames.append(fp)

    if verbose:
        print(f"=== {category}/{name} after {steps} steps (dt={dt:.5f}) ===")
        print(f"{'solver':15s} {'ms/step':>8s} {'bodies':>7s} {'contacts':>8s} {'pen(max)':>9s} {'KE':>12s} {'overflow':>8s} {'cap-use':>8s}")
        for solver, r in runs.items():
            st = statistics(r["state"])
            # capacity headroom: peak utilization across the fixed tables
            # (reference's proxy-count / high-water analog, timer.h:8-17)
            cap = max(st.utilization.values())
            print(
                f"{solver.name:15s} {r['ms']/steps:8.2f} {st.body_count:7d} {st.contact_count:8d}"
                f" {st.max_penetration:9.4f} {st.kinetic_energy:12.3f} {st.color_overflow:8d} {cap:7.0%}"
            )
    if render and not render_every:
        _render(runs, f"{render}", f"{category}/{name} step {steps}", draw_options)
    if gif and frames:
        _stitch_gif(frames, render)
    return runs


def _stitch_gif(frames, path, fps=15):
    """Animated multi-solver divergence view — the headless analog of watching
    the reference testbed's overlaid worlds over time (samples/main.cpp:805-813)."""
    import os

    from PIL import Image

    imgs = [Image.open(f) for f in frames]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:], duration=int(1000 / fps), loop=0
    )
    for im in imgs:
        im.close()
    for f in frames:
        os.remove(f)
    print(f"wrote {path} ({len(frames)} frames)")


def _render(runs, path, title, options=None):
    from .utils.draw import render_states

    render_states(
        {s.name: r["state"] for s, r in runs.items()}, path=path, title=title, options=options
    )
    print(f"wrote {path}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("scene", nargs="?", help="Category/Name, e.g. 'Contact/Pyramid'")
    p.add_argument("--list", action="store_true", help="list the scene catalog")
    p.add_argument("--solvers", default="PGS_NGS_BLOCK", help="comma list or 'all'")
    p.add_argument("--steps", type=int, default=240)
    p.add_argument("--hertz", type=float, default=60.0)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--extra-iters", type=int, default=2)
    p.add_argument("--no-warm-start", action="store_true")
    p.add_argument("--multi-steps", type=int, default=1,
                   help="world-steps per frame (reference: samples/sample.cpp:130-137)")
    p.add_argument("--bucket-cap", type=int, default=0,
                   help="color-bucketed solve per-color capacity (-1 auto, 0 dense)")
    p.add_argument("--render", default=None, help="output PNG path")
    p.add_argument("--render-every", type=int, default=0)
    p.add_argument("--interactive", action="store_true",
                   help="open a live matplotlib window with the reference's "
                        "key bindings (P/O/R, [/], ,/.) and mouse drag "
                        "(reference: samples/main.cpp:151-289)")
    p.add_argument("--interactive-gif", default=None, metavar="PATH",
                   help="record N headless interactive frames to an animated "
                        "GIF instead of opening a window")
    # debug-draw layer toggles (reference: debug_draw.h:45-54)
    p.add_argument("--draw-aabbs", action="store_true")
    p.add_argument("--draw-mass", action="store_true")
    p.add_argument("--draw-contact-points", action="store_true")
    p.add_argument("--draw-contact-normals", action="store_true")
    p.add_argument("--draw-contact-impulses", action="store_true")
    p.add_argument("--draw-friction-impulses", action="store_true")
    args = p.parse_args(argv)

    if args.list or not args.scene:
        for cat, name in scene_names():
            print(f"{cat}/{name}")
        return 0

    category, name = args.scene.split("/", 1)
    if args.solvers == "all":
        solvers = list(SolverType)
    else:
        solvers = [SolverType[s.strip()] for s in args.solvers.split(",")]

    if args.interactive or args.interactive_gif:
        from .interactive import InteractiveTestbed

        tb = InteractiveTestbed(
            solvers, scene=f"{category}/{name}", hertz=args.hertz,
            iterations=args.iters, extra_iterations=args.extra_iters,
            warm_start=not args.no_warm_start,
        )
        if args.interactive_gif:
            out = tb.record_gif(args.interactive_gif, frames=args.steps)
            print(f"wrote {out}")
        else:
            tb.run()
        return 0
    from .utils.draw import DrawOptions

    opts = DrawOptions(
        draw_aabbs=args.draw_aabbs,
        draw_mass=args.draw_mass,
        draw_contact_points=args.draw_contact_points or args.draw_contact_normals
        or args.draw_contact_impulses or args.draw_friction_impulses,
        draw_contact_normals=args.draw_contact_normals,
        draw_contact_impulses=args.draw_contact_impulses,
        draw_friction_impulses=args.draw_friction_impulses,
    )
    run_scene(
        category, name, solvers,
        steps=args.steps, hertz=args.hertz,
        iterations=args.iters, extra_iterations=args.extra_iters,
        warm_start=not args.no_warm_start,
        multi_steps=args.multi_steps,
        render=args.render, render_every=args.render_every,
        draw_options=opts,
        bucket_cap=args.bucket_cap,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
