"""Relaxed-barrier penalty visualization (design tool).

Parity: legged_interface/src/constraint/design_tools/
relaxedBarrierPenaltyVis.py — the reference's only Python file, a
matplotlib plot of the relaxed log-barrier used to tune mu/delta.

    python tools/penalty_vis.py [mu] [delta] [out.png]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(mu=0.1, delta=5.0, out=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hunter_bipedal_control_tpu.ocp.penalties import relaxed_barrier

    h = jnp.linspace(-2.0 * delta, 6.0 * delta, 400)
    p, dp, d2p = relaxed_barrier(h, mu, delta)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
        for ax, y, name in zip(axes, [p, dp, d2p], ["penalty", "gradient", "hessian"]):
            ax.plot(np.asarray(h), np.asarray(y))
            ax.axvline(delta, ls="--", lw=0.8, color="gray")
            ax.set_title(f"{name} (mu={mu}, delta={delta})")
            ax.set_xlabel("h")
            ax.grid(alpha=0.3)
        fig.tight_layout()
        path = out or "relaxed_barrier.png"
        fig.savefig(path, dpi=120)
        print(f"wrote {path}")
    except ImportError:
        # headless fallback: print a small table
        for hi in np.linspace(-delta, 4 * delta, 11):
            pi, di, ddi = relaxed_barrier(jnp.asarray(hi), mu, delta)
            print(f"h={hi:+8.3f}  p={float(pi):+10.4f}  dp={float(di):+10.4f}  "
                  f"d2p={float(ddi):+10.4f}")


if __name__ == "__main__":
    args = [float(a) for a in sys.argv[1:3]]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    main(*(args or [0.1, 5.0]), out=out)
