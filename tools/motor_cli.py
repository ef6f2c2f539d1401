"""Motor commissioning CLI — the analog of the reference's standalone
motor-control tool (legged_examples/legged_bridge/app/main.cpp:20-50, a CLI
that exercises individual motors over the fieldbus).

Here the bus is the native UDP transport; the counterpart can be the
physics sim server or a hardware shim speaking the same LowState/LowCmd
structs.

Usage:
  python tools/motor_cli.py status                 # print latest LowState
  python tools/motor_cli.py hold                   # send default-pose PD hold
  python tools/motor_cli.py set J POS [KP] [KD]    # command one joint
  python tools/motor_cli.py zero                   # zero torques (damping)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hunter_bipedal_control_tpu.runtime import native  # noqa: E402

DEFAULT_POSE = [0.10, 0.0, 0.40, 0.93, 0.53, -0.10, 0.0, -0.40, 0.93, -0.53]
ADDR = "127.0.0.1"


def main(argv):
    if not argv:
        print(__doc__)
        return 1
    cmd = argv[0]
    rx = native.UdpChannel(ADDR, 7667, "recv")
    tx = native.UdpChannel(ADDR, 7668, "send")

    if cmd == "status":
        time.sleep(0.2)
        s = rx.recv_latest(native.LowState)
        if s is None:
            print("no LowState received (is the sim server / robot up?)")
            return 2
        print(f"t={s.t:.3f} quat=({s.quat[0]:.3f},{s.quat[1]:.3f},"
              f"{s.quat[2]:.3f},{s.quat[3]:.3f})")
        for i in range(10):
            print(f"  joint {i}: q={s.q[i]:+.4f} dq={s.dq[i]:+.4f} tau={s.tau[i]:+.3f}")
        return 0

    lc = native.LowCmd()
    if cmd == "hold":
        for i in range(10):
            lc.pos[i] = DEFAULT_POSE[i]
            lc.kp[i] = 30.0
            lc.kd[i] = 1.5
    elif cmd == "zero":
        for i in range(10):
            lc.kd[i] = 1.0
    elif cmd == "set" and len(argv) >= 3:
        j = int(argv[1])
        for i in range(10):
            lc.pos[i] = DEFAULT_POSE[i]
            lc.kp[i] = 30.0
            lc.kd[i] = 1.5
        lc.pos[j] = float(argv[2])
        if len(argv) > 3:
            lc.kp[j] = float(argv[3])
        if len(argv) > 4:
            lc.kd[j] = float(argv[4])
    else:
        print(__doc__)
        return 1
    tx.send_struct(lc)
    print("command sent")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
