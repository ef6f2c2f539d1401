"""Offline trajectory visualization — the RViz-visualizer analog.

Parity target: LeggedRobotVisualizer (legged_interface/src/visualization/
LeggedRobotVisualizer.cpp:87-549) publishes robot state TF, foot markers,
contact forces and desired/optimized trajectories to RViz.  This framework
records the same signals headlessly (runtime/telemetry.py TraceRecorder);
this tool turns a saved trace (.npz) into figures:

  python tools/visualize.py trace.npz -o trace.png
  python tools/visualize.py trace.npz --skeleton skel.png   # stick-figure strip

Chart conventions: one y-axis per panel, fixed categorical color order,
recessive grids, legends + selective direct labels.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# categorical palette (fixed assignment order, never cycled)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4",
          "#008300", "#4a3aa7", "#e34948"]
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = dict(color="#d8d7d2", linewidth=0.6)
FEET = ["L toe", "R toe", "L heel", "R heel"]  # contact order (CLAUDE.md)


def _style(ax, title=None, ylabel=None, xlabel=None):
    ax.set_facecolor(SURFACE)
    ax.grid(True, **GRID)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(TEXT2)
    ax.tick_params(colors=TEXT2, labelsize=8)
    if title:
        ax.set_title(title, color=TEXT, fontsize=10, loc="left")
    if ylabel:
        ax.set_ylabel(ylabel, color=TEXT2, fontsize=8)
    if xlabel:
        ax.set_xlabel(xlabel, color=TEXT2, fontsize=8)


def plot_trace(data, out_path):
    """Multi-panel summary figure from a telemetry npz (run_sim_loop /
    run_dummy_loop keys; missing keys skip their panel)."""
    t = np.asarray(data["t"]) if "t" in data else np.arange(
        len(next(iter(data.values()))))

    panels = []
    if "base_z" in data:
        panels.append("base")
    if "vx_est" in data:
        panels.append("vel")
    if "contact_fz" in data:
        panels.append("forces")
    if "est_contact" in data:
        panels.append("gait")
    if "cost" in data:
        panels.append("cost")
    if "violation" in data:
        panels.append("viol")
    if "q" in data:
        panels.extend(["jl", "jr"])

    n = len(panels)
    fig, axes = plt.subplots(n, 1, figsize=(9, 1.9 * n), sharex=True)
    fig.patch.set_facecolor(SURFACE)
    if n == 1:
        axes = [axes]
    axmap = dict(zip(panels, axes))

    if "base" in axmap:
        ax = axmap["base"]
        ax.plot(t, data["base_z"], color=SERIES[0], lw=2)
        ax.axhline(0.63, color=TEXT2, lw=1, ls="--")
        ax.annotate("nominal 0.63 m", (t[0], 0.63), textcoords="offset points",
                    xytext=(4, 4), fontsize=7, color=TEXT2)
        _style(ax, "Base height", "z [m]")

    if "vel" in axmap:
        ax = axmap["vel"]
        ax.plot(t, data["vx_est"], color=SERIES[0], lw=2, label="estimated vx")
        if "cmd_vx" in data:
            ax.plot(t, data["cmd_vx"], color=SERIES[1], lw=2, label="commanded vx")
            ax.legend(fontsize=7, frameon=False, labelcolor=TEXT2)
        _style(ax, "Forward velocity", "vx [m/s]")

    if "forces" in axmap:
        ax = axmap["forces"]
        fz = np.asarray(data["contact_fz"])
        for i in range(fz.shape[1]):
            ax.plot(t, fz[:, i], color=SERIES[i], lw=1.5, label=FEET[i])
        ax.legend(fontsize=7, frameon=False, ncol=4, labelcolor=TEXT2)
        _style(ax, "Contact normal forces", "Fz [N]")

    if "gait" in axmap:
        ax = axmap["gait"]
        c = np.asarray(data["est_contact"])  # (T, 4) 0/1
        dt_bar = np.median(np.diff(t)) if len(t) > 1 else 1.0
        for i in range(c.shape[1]):
            on = c[:, i] > 0.5
            spans = []
            start = None
            for k, flag in enumerate(on):
                if flag and start is None:
                    start = t[k]
                if not flag and start is not None:
                    spans.append((start, t[k] - start))
                    start = None
            if start is not None:
                spans.append((start, t[-1] - start + dt_bar))
            ax.broken_barh(spans, (i + 0.15, 0.7), facecolors=SERIES[i])
        ax.set_yticks(np.arange(c.shape[1]) + 0.5)
        ax.set_yticklabels(FEET, fontsize=7, color=TEXT2)
        _style(ax, "Estimated contact (gait diagram)")

    if "cost" in axmap:
        ax = axmap["cost"]
        ax.plot(t, data["cost"], color=SERIES[0], lw=2)
        _style(ax, "MPC cost", "cost")

    if "viol" in axmap:
        ax = axmap["viol"]
        ax.semilogy(t, np.maximum(np.asarray(data["violation"]), 1e-12),
                    color=SERIES[1], lw=2)
        _style(ax, "Constraint violation", "|g| (log)")

    if "jl" in axmap:
        q = np.asarray(data["q"])
        names = [f"j{k + 1}" for k in range(5)]
        for ax, sl, title in ((axmap["jl"], slice(6, 11), "Left-leg joints"),
                              (axmap["jr"], slice(11, 16), "Right-leg joints")):
            qs = q[:, sl]
            for i in range(qs.shape[1]):
                ax.plot(t, qs[:, i], color=SERIES[i], lw=1.5, label=names[i])
            ax.legend(fontsize=7, frameon=False, ncol=5, labelcolor=TEXT2)
            _style(ax, title, "angle [rad]")

    axes[-1].set_xlabel("time [s]", color=TEXT2, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=140, facecolor=SURFACE)
    print(f"wrote {out_path} ({n} panels, {len(t)} samples)")


def plot_skeleton(data, out_path, n_frames=8):
    """Side-view (x-z) stick-figure strip from recorded plant configurations —
    the robot-state TF / foot-marker view of the RViz visualizer."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hunter_bipedal_control_tpu.models.kinematics import (
        contact_positions, fk)
    from hunter_bipedal_control_tpu.models.robot import load_model

    q_all = np.asarray(data["q"])
    t = np.asarray(data["t"]) if "t" in data else np.arange(len(q_all))
    m = load_model(dtype=jnp.float32)
    idx = np.linspace(0, len(q_all) - 1, n_frames).astype(int)

    fig, axes = plt.subplots(1, n_frames, figsize=(2.0 * n_frames, 3.2),
                             sharey=True)
    fig.patch.set_facecolor(SURFACE)
    for ax, k in zip(np.atleast_1d(axes), idx):
        kin = fk(m, jnp.asarray(q_all[k]))
        p = np.asarray(kin.p)
        feet = np.asarray(contact_positions(m, kin))
        # draw each joint's parent-origin -> child-origin segment
        for j in range(m.nj):
            pa = p[int(m.joint_parent[j])]
            ch = p[int(m.joint_child[j])]
            col = SERIES[0] if j < 5 else SERIES[1]
            ax.plot([pa[0], ch[0]], [pa[2], ch[2]], color=col, lw=2)
        # toe/heel segments + contact markers
        for leg, (toe, heel) in enumerate(((0, 2), (1, 3))):
            ax.plot([feet[heel][0], feet[toe][0]], [feet[heel][2], feet[toe][2]],
                    color=SERIES[leg], lw=2)
        ax.scatter(feet[:, 0], feet[:, 2], s=14, color=[SERIES[i] for i in
                                                        (0, 1, 0, 1)], zorder=3)
        ax.scatter([p[0, 0]], [p[0, 2]], s=40, color=TEXT, zorder=3)
        ax.axhline(0.0, color=TEXT2, lw=1)
        ax.set_aspect("equal")
        _style(ax, f"t={t[k]:.2f}s")
    fig.tight_layout()
    fig.savefig(out_path, dpi=140, facecolor=SURFACE)
    print(f"wrote {out_path} ({n_frames} frames)")


def plot_execution(data, out_path):
    """Desired-vs-optimized trajectory overlays + per-foot force arrows — the
    LeggedRobotVisualizer `update` view (LeggedRobotVisualizer.cpp:140-178:
    optimized + desired trajectories, foot force markers), headless.

    Needs an MjClosedLoop trace recorded with the per-tick policy keys
    (x_opt/u_opt/wbc_x, runtime/mj_loop.py telemetry).  Four panels:
      1. base vx: command vs MPC-optimized vs measured,
      2. L-toe x-z executed path vs the policy's desired path, force arrows,
      3. toe z: desired vs measured with contact shading,
      4. contact force Fz: MPC-planned vs WBC-allocated vs plant.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hunter_bipedal_control_tpu.models.kinematics import (
        contact_positions, fk)
    from hunter_bipedal_control_tpu.models.robot import load_model

    for key in ("x_opt", "u_opt", "q", "t"):
        if key not in data:
            raise SystemExit(f"trace has no '{key}' key; record with "
                             "MjClosedLoop.run(record=True) on current code")
    t = np.asarray(data["t"])
    q = np.asarray(data["q"])
    x_opt = np.asarray(data["x_opt"])
    u_opt = np.asarray(data["u_opt"])
    m = load_model(dtype=jnp.float32)

    fk_feet = jax.jit(jax.vmap(lambda qq: contact_positions(m, fk(m, qq))))
    feet_meas = np.asarray(fk_feet(jnp.asarray(q[:, 0:16]).astype(jnp.float32)
                                   if q.shape[1] == 16 else
                                   jnp.asarray(
                                       np.concatenate([q[:, 0:6], q[:, 6:16]],
                                                      axis=1), jnp.float32)))
    q_des = np.concatenate([x_opt[:, 6:12], x_opt[:, 12:22]], axis=1)
    feet_des = np.asarray(fk_feet(jnp.asarray(q_des, jnp.float32)))

    fz_plant = np.asarray(data["contact_fz"]) if "contact_fz" in data else None
    f_mpc = u_opt[:, 0:12].reshape(-1, 4, 3)
    f_wbc = (np.asarray(data["wbc_x"])[:, 16:28].reshape(-1, 4, 3)
             if "wbc_x" in data else None)

    fig, axes = plt.subplots(4, 1, figsize=(10, 11))
    fig.patch.set_facecolor(SURFACE)

    ax = axes[0]
    if "cmd_vx" in data:
        ax.plot(t, np.asarray(data["cmd_vx"]), color=TEXT2, lw=1,
                ls="--", label="command")
    ax.plot(t, x_opt[:, 0], color=SERIES[1], lw=1.2, label="MPC optimized")
    ax.plot(t, np.asarray(data["v"])[:, 0], color=SERIES[0], lw=1.2,
            label="measured")
    ax.legend(fontsize=8, frameon=False, ncol=3)
    _style(ax, "base forward velocity: desired vs optimized vs executed",
           "vx [m/s]")

    ax = axes[1]
    sl = t > (t[0] + max(t[-1] - t[0] - 2.0, 0.0))   # last ~2 s
    ax.plot(feet_meas[sl, 0, 0], feet_meas[sl, 0, 2], color=SERIES[0],
            lw=1.2, label="L toe executed")
    ax.plot(feet_des[sl, 0, 0], feet_des[sl, 0, 2], color=SERIES[1],
            lw=1.0, ls="--", label="L toe desired (policy)")
    if fz_plant is not None and fz_plant.ndim == 2 and fz_plant.shape[1] >= 4:
        fz_l = fz_plant[:, 0] if fz_plant.shape[1] == 4 else \
            fz_plant.reshape(len(t), 4, 3)[:, 0, 2]
        step = max(len(t[sl]) // 40, 1)
        idx = np.where(sl)[0][::step]
        ax.quiver(feet_meas[idx, 0, 0], feet_meas[idx, 0, 2],
                  np.zeros(len(idx)), fz_l[idx] / 400.0, color=SERIES[2],
                  width=0.002, scale=1, scale_units="y", label="contact Fz")
    ax.axhline(0.0, color=TEXT2, lw=0.8)
    ax.legend(fontsize=8, frameon=False, ncol=3)
    _style(ax, "L-toe sagittal path: executed vs desired, force arrows",
           "z [m]", "x [m]")

    ax = axes[2]
    ax.plot(t, feet_des[:, 0, 2], color=SERIES[1], lw=1.0, ls="--",
            label="desired")
    ax.plot(t, feet_meas[:, 0, 2], color=SERIES[0], lw=1.2, label="measured")
    ax.legend(fontsize=8, frameon=False, ncol=2)
    _style(ax, "L-toe height: desired vs executed", "z [m]")

    ax = axes[3]
    if fz_plant is not None:
        fz4 = fz_plant if fz_plant.ndim == 2 and fz_plant.shape[1] == 4 \
            else fz_plant.reshape(len(t), 4, 3)[:, :, 2]
        ax.plot(t, fz4.sum(1), color=SERIES[0], lw=1.0, label="plant")
    ax.plot(t, f_mpc[:, :, 2].sum(1), color=SERIES[1], lw=1.0,
            label="MPC planned")
    if f_wbc is not None:
        ax.plot(t, f_wbc[:, :, 2].sum(1), color=SERIES[2], lw=1.0,
                label="WBC allocated")
    ax.legend(fontsize=8, frameon=False, ncol=3)
    _style(ax, "total vertical contact force: plan vs allocation vs plant",
           "Fz [N]", "t [s]")

    fig.tight_layout()
    fig.savefig(out_path, dpi=140, facecolor=SURFACE)
    print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace", help="npz trace from TraceRecorder.save_npz")
    ap.add_argument("-o", "--out", default=None, help="summary figure path")
    ap.add_argument("--skeleton", default=None, help="stick-figure strip path")
    ap.add_argument("--execution", default=None,
                    help="desired-vs-optimized overlay + force-arrow figure")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    data = dict(np.load(args.trace))
    if args.out is None and args.skeleton is None and args.execution is None:
        args.out = os.path.splitext(args.trace)[0] + ".png"
    if args.out:
        plot_trace(data, args.out)
    if args.skeleton:
        if "q" not in data:
            raise SystemExit("trace has no 'q' key; cannot draw skeletons")
        plot_skeleton(data, args.skeleton, args.frames)
    if args.execution:
        plot_execution(data, args.execution)


if __name__ == "__main__":
    main()
