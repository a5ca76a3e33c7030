import io
import zlib

import numpy as np

from taichislam_tpu.utils.comm import (
    CHANNEL_SUBMAP,
    CHANNEL_TRAJ,
    LoopbackTransport,
    SLAMComm,
    UDPMulticastTransport,
)
from taichislam_tpu.utils.lcm_codec import (
    BUFFER_FINGERPRINT,
    BufferMsg,
    TimeT,
)


def test_buffer_codec_roundtrip():
    msg = BufferMsg(TimeT(12, 34), drone_id=3, msg_id=777,
                    buffer=b"hello world")
    data = msg.encode()
    assert data[:8] == BUFFER_FINGERPRINT
    back = BufferMsg.decode(data)
    assert back.drone_id == 3
    assert back.msg_id == 777
    assert back.buffer == b"hello world"
    assert back.timestamp.sec == 12 and back.timestamp.nsec == 34


def test_buffer_fingerprint_matches_lcm_gen():
    # The fingerprint must equal the lcm-gen'd schema hash so reference peers
    # (communication.py) can decode our messages: rot1(buffer_base +
    # rot1(time_base)), cf. Buffer.py:58-70.
    assert BUFFER_FINGERPRINT.hex() == "c0b52b72031a4c9f"


def test_loopback_two_drones_submap_exchange():
    hub = LoopbackTransport.Hub()
    a = SLAMComm(drone_id=0, transport=LoopbackTransport(hub))
    b = SLAMComm(drone_id=1, transport=LoopbackTransport(hub))
    got_a, got_b = [], []
    a.on_submap = got_a.append
    b.on_submap = got_b.append

    payload = zlib.compress(b"x" * 100000, 1)
    a.publishBuffer(payload, CHANNEL_SUBMAP)
    a.handle()
    b.handle()
    # sender suppresses its own message; receiver gets it
    assert got_a == []
    assert got_b == [payload]


def test_loopback_traj_channel():
    hub = LoopbackTransport.Hub()
    a = SLAMComm(drone_id=0, transport=LoopbackTransport(hub))
    b = SLAMComm(drone_id=1, transport=LoopbackTransport(hub))
    got = []
    b.on_traj = got.append
    a.publishBuffer(b"traj-bytes", CHANNEL_TRAJ)
    b.handle()
    assert got == [b"traj-bytes"]


def test_native_transport_interop_with_python():
    """C++ transport (taichislam_tpu/runtime) <-> Python transport over real
    multicast loopback, both directions, incl. fragmentation."""
    import time
    from taichislam_tpu.runtime import native_available
    if not native_available():
        import pytest
        pytest.skip("native transport not built")
    from taichislam_tpu.runtime import NativeUDPMulticastTransport

    url = "udpm://224.0.0.251:17998?ttl=0"
    try:
        nat = NativeUDPMulticastTransport(url)
        py = UDPMulticastTransport(url)
    except OSError:
        import pytest
        pytest.skip("multicast unavailable in sandbox")
    try:
        time.sleep(0.2)
        nat.publish("chan", b"hello-from-native")
        msgs = py.poll(500)
        if not msgs:
            import pytest
            pytest.skip("multicast loopback not delivered in sandbox")
        assert ("chan", b"hello-from-native") in msgs

        big = bytes(np.random.default_rng(0).integers(
            0, 256, 250000, dtype=np.uint8))
        py.publish("big", big)
        got = {}
        for _ in range(10):
            for c, d in nat.poll(300):
                got[c] = d
            if "big" in got:
                break
        assert got.get("big") == big
    finally:
        nat.close()
        py.close()


def test_udpm_transport_loopback_short_and_fragmented():
    try:
        t1 = UDPMulticastTransport("udpm://224.0.0.251:17667?ttl=0")
        t2 = UDPMulticastTransport("udpm://224.0.0.251:17667?ttl=0")
    except OSError:
        import pytest
        pytest.skip("multicast unavailable in sandbox")
    try:
        t1.publish("chan", b"small")
        msgs = t2.poll(300)
        if not msgs:
            import pytest
            pytest.skip("multicast loopback not delivered in sandbox")
        assert ("chan", b"small") in msgs

        big = bytes(np.random.default_rng(0).integers(
            0, 256, 300000, dtype=np.uint8))
        t1.publish("big", big)
        got = {}
        for _ in range(10):
            for c, d in t2.poll(200):
                got[c] = d
            if "big" in got:
                break
        assert got.get("big") == big
    finally:
        t1.close()
        t2.close()
