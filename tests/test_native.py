"""Native runtime library: UDP transport, rate keeper, triple buffer."""
import time

import numpy as np
import pytest

from hunter_bipedal_control_tpu.runtime import native


@pytest.fixture(scope="module")
def lib():
    return native.load_library()


def test_struct_sizes(lib):
    assert lib.rt_sizeof_low_state() == native.ctypes.sizeof(native.LowState)
    assert lib.rt_sizeof_low_cmd() == native.ctypes.sizeof(native.LowCmd)


def test_udp_loopback(lib):
    rx = native.UdpChannel("127.0.0.1", 47311, "recv")
    tx = native.UdpChannel("127.0.0.1", 47311, "send")
    s = native.LowState()
    s.t = 1.25
    for i in range(10):
        s.q[i] = 0.1 * i
    # send three, receiver must keep the latest
    for seq in range(3):
        s.seq = seq
        tx.send_struct(s)
    time.sleep(0.05)
    got = rx.recv_latest(native.LowState)
    assert got is not None
    assert got.seq == 2
    assert abs(got.t - 1.25) < 1e-12
    assert abs(got.q[3] - 0.3) < 1e-12
    # nothing new -> None
    assert rx.recv_latest(native.LowState) is None
    tx.close()
    rx.close()


def test_rate_keeper(lib):
    rk = native.RateKeeper(500.0)
    t0 = time.perf_counter()
    for _ in range(50):
        late = rk.sleep()
        assert late < 50.0
    elapsed = time.perf_counter() - t0
    # 50 cycles at 500 Hz = 100 ms (generous CI band)
    assert 0.05 < elapsed < 0.5
    st = rk.stats()
    assert st["cycles"] == 50


def test_triple_buffer(lib):
    tb = native.TripleBuffer(1024)
    assert tb.read(np.float64, (4,)) is None
    tb.write(np.arange(4, dtype=np.float64))
    got = tb.read(np.float64, (4,))
    np.testing.assert_allclose(got, [0, 1, 2, 3])
    # overwrite keeps the freshest
    tb.write(np.arange(4, dtype=np.float64) + 10)
    tb.write(np.arange(4, dtype=np.float64) + 20)
    got = tb.read(np.float64, (4,))
    np.testing.assert_allclose(got, [20, 21, 22, 23])
    # read again still returns the latest published
    got = tb.read(np.float64, (4,))
    np.testing.assert_allclose(got, [20, 21, 22, 23])


def test_mujoco_sim_server_roundtrip(lib):
    """Two-process parity smoke: the MuJoCo physics server publishes
    LowState and consumes LowCmd over the latest-wins UDP wire (the
    reference's mujoco-process <-> controller-process architecture,
    LeggedMujocoSim.cpp:29-67)."""
    pytest.importorskip("mujoco")
    import threading

    from hunter_bipedal_control_tpu.backends import sim_server

    addr, sp, cp = "127.0.0.1", 47411, 47412
    th = threading.Thread(
        target=sim_server.run_mujoco_server,
        kwargs=dict(addr=addr, state_port=sp, cmd_port=cp, duration=2.0,
                    realtime=False, verbose=False),
        daemon=True,
    )
    th.start()
    rx = native.UdpChannel(addr, sp, "recv")
    tx = native.UdpChannel(addr, cp, "send")
    dj = [0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53]
    lc = native.LowCmd()
    for i in range(10):
        lc.pos[i] = dj[i]
        lc.kp[i] = 60.0
        lc.kd[i] = 2.0
    states = []
    t_end = time.time() + 2.5
    while time.time() < t_end and len(states) < 200:
        tx.send_struct(lc)
        got = rx.recv_latest(native.LowState)
        if got is not None:
            states.append((got.seq, got.t, list(got.q), list(got.quat)))
        time.sleep(0.002)
    th.join(timeout=5.0)
    assert len(states) > 20
    seqs = [s[0] for s in states]
    assert seqs == sorted(seqs)           # monotone latest-wins stream
    t0, tN = states[0][1], states[-1][1]
    assert tN > t0                        # sim time advances
    # under the commanded PD hold the robot stays near the default pose
    qj = np.asarray(states[-1][2])
    assert abs(qj[2] - 0.40) < 0.3
    quat = np.asarray(states[-1][3])
    np.testing.assert_allclose(np.linalg.norm(quat), 1.0, atol=1e-6)
