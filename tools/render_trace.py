"""Offscreen 3D playback of a recorded trace — the simulate-UI/RViz analog.

Parity target: LeggedRobotVisualizer.cpp:140-178 (robot state playback) and
the vendored MuJoCo `simulate` UI.  This renders a TraceRecorder/MjClosedLoop
npz trace (keys: t, q at minimum) with MuJoCo's offscreen EGL renderer into
an mp4 (cv2) or an animated gif fallback, with a chase camera.

  python tools/render_trace.py trace.npz out.mp4 [--fps 30] [--size 640x480]
  python tools/render_trace.py trace.npz out.mp4 --speed 1.0 --cam-dist 1.6

Headless GL: MUJOCO_GL=egl + EGL_PLATFORM=surfaceless (set automatically);
no display needed.
"""
import argparse
import os
import sys

os.environ.setdefault("MUJOCO_GL", "egl")
os.environ.setdefault("EGL_PLATFORM", "surfaceless")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render(trace_path: str, out_path: str, fps: int = 30, size=(640, 480),
           speed: float = 1.0, cam_dist: float = 1.6, cam_elev: float = -12.0,
           cam_azim: float = 135.0):
    import mujoco

    from hunter_bipedal_control_tpu.models import mjcf

    telem = np.load(trace_path)
    t = np.asarray(telem["t"], float)
    q = np.asarray(telem["q"], float)          # (T, 16) repo convention
    if q.shape[1] < 16:
        raise ValueError(f"trace q has {q.shape[1]} cols, need >=16")

    model = mjcf.load_mj_model(floor=True)
    data = mujoco.MjData(model)
    w, h = size
    renderer = mujoco.Renderer(model, h, w)

    cam = mujoco.MjvCamera()
    cam.type = mujoco.mjtCamera.mjCAMERA_FREE
    cam.distance = cam_dist
    cam.elevation = cam_elev
    cam.azimuth = cam_azim

    # resample the trace at the video rate (sim time / speed = wall time)
    t_frames = np.arange(t[0], t[-1], speed / fps)
    idx = np.searchsorted(t, t_frames).clip(0, len(t) - 1)

    frames = []
    opt = mujoco.MjvOption()
    opt.flags[mujoco.mjtVisFlag.mjVIS_CONTACTPOINT] = True
    opt.flags[mujoco.mjtVisFlag.mjVIS_CONTACTFORCE] = True
    # hunter.xml places the body's primitive geoms in collision group 3
    # (its visual meshes are stripped by the loader) — show them
    opt.geomgroup[3] = 1
    model.vis.headlight.ambient[:] = [0.45, 0.45, 0.45]
    model.vis.headlight.diffuse[:] = [0.8, 0.8, 0.8]
    model.vis.scale.contactwidth = 0.04
    model.vis.scale.contactheight = 0.01
    model.vis.map.force = 0.01
    for k in idx:
        data.qpos[:] = mjcf.q_to_mj(q[k])
        mujoco.mj_forward(model, data)
        cam.lookat[:] = [q[k, 0], q[k, 1], 0.45]
        renderer.update_scene(data, camera=cam, scene_option=opt)
        frames.append(renderer.render().copy())

    if out_path.endswith(".gif"):
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
    else:
        import cv2
        vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
        if not vw.isOpened():
            raise RuntimeError("cv2 VideoWriter failed to open " + out_path)
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
    print(f"{len(frames)} frames ({t[0]:.2f}..{t[-1]:.2f}s sim, "
          f"{len(frames) / fps:.1f}s video) -> {out_path}")
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace", help="npz trace (t, q keys)")
    ap.add_argument("out", help="output .mp4 or .gif")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--speed", type=float, default=1.0,
                    help="playback speed (1.0 = real time)")
    ap.add_argument("--cam-dist", type=float, default=1.6)
    ap.add_argument("--cam-elev", type=float, default=-12.0)
    ap.add_argument("--cam-azim", type=float, default=135.0)
    a = ap.parse_args()
    w, h = (int(x) for x in a.size.split("x"))
    render(a.trace, a.out, fps=a.fps, size=(w, h), speed=a.speed,
           cam_dist=a.cam_dist, cam_elev=a.cam_elev, cam_azim=a.cam_azim)


if __name__ == "__main__":
    main()
