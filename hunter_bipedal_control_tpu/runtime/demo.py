"""Closed-loop demo: stand, then walk on cmd_vel — the README scenario
(reference README.md stand-up / /set_walk / cmd_vel procedure) against the
dummy backend.

    python -m hunter_bipedal_control_tpu.runtime.demo [seconds] [vx] [trace.npz]

An optional third argument saves the telemetry trace to .npz for
``tools/visualize.py`` (the RViz-visualizer analog).
"""
import sys
import time


def main(seconds=1.0, vx=0.35, backend_cpu=False, trace_path=None):
    import os

    import jax

    if backend_cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ..models.robot import load_model
    from ..ocp import problem as ocp
    from ..refs import swing_planner as swp, targets as tg
    from ..runtime import loop as rloop
    from ..runtime.controller import default_gains
    from ..solver import sqp
    from ..wbc.wbc import default_wbc_params

    m = load_model()
    settings = sqp.SqpSettings()
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53],
                   jnp.float32)
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], jnp.float32),
                            jnp.zeros(3, jnp.float32), dj])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, jnp.float32), qnom])
    st = rloop.init_loop_state(m, settings, x0)

    NP = int(seconds * 100)
    cmds = np.zeros((NP, 4), np.float32)
    cmds[min(30, NP // 3):, 0] = vx
    run = jax.jit(
        lambda st, c: rloop.run_dummy_loop(
            m, settings, params, swp.default_swing_config(), default_wbc_params(),
            default_gains(), tg.default_cmd_vel_config(), rloop.LoopConfig(),
            st, c, NP, dj,
        )
    )
    print(f"compiling + running {NP} MPC periods ({seconds:.1f}s sim, "
          f"cmd vx={vx}) on {jax.devices()[0]} ...", flush=True)
    t0 = time.perf_counter()
    fin, telem = run(st, jnp.asarray(cmds))
    telem["base_z"].block_until_ready()
    wall = time.perf_counter() - t0

    z = np.asarray(telem["base_z"])
    x = np.asarray(telem["x"])
    gl = np.asarray(telem["gait_level"])
    viol = np.asarray(telem["violation"])
    for k in range(0, NP, max(NP // 10, 1)):
        print(f"  t={k * 0.01:5.2f}s  z={z[k]:.4f}  vx={x[k, 0]:+.3f}  "
              f"px={x[k, 6]:+.3f}  gait={gl[k]}  viol={viol[k]:.4f}")
    print(f"final: pos=({x[-1, 6]:+.3f},{x[-1, 7]:+.3f}) z={z[-1]:.4f} "
          f"vx={x[-1, 0]:+.3f} gait={gl[-1]} estop={bool(fin.emergency_stop)}")
    print(f"wall: {wall:.1f}s for {seconds:.1f}s sim "
          f"({NP} MPC solves + {NP * 5} WBC ticks)")
    if trace_path:
        from .telemetry import TraceRecorder

        rec = TraceRecorder()
        rec.extend_stacked({
            "t": telem["t"], "base_z": telem["base_z"],
            "cost": telem["cost"], "violation": telem["violation"],
            "gait_level": telem["gait_level"],
            "vx_est": np.asarray(telem["x"])[:, 0],
            "cmd_vx": cmds[:, 0],
            # plant pose + joints in the 16-dof q layout for skeleton plots
            "q": np.asarray(telem["x"])[:, 6:22],
        })
        rec.save_npz(trace_path)
        print(f"trace -> {trace_path} ({len(rec)} periods)")
    return 0


if __name__ == "__main__":
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    vx = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35
    tr = sys.argv[3] if len(sys.argv) > 3 else None
    sys.exit(main(secs, vx, trace_path=tr))
