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
