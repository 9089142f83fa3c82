"""Native C++ runtime: codec equivalence with the python/jnp path."""

import numpy as np
import jax.numpy as jnp
import pytest

from agrifly_tpu.io import native, radio, telemetry

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


def test_radio_rates_encode_matches_python():
    rng = np.random.default_rng(0)
    n = 64
    thrust = rng.uniform(-5, 40, n).astype(np.float32)
    angvel = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    raw = native.radio_encode_rates(thrust, angvel)
    for i in range(n):
        t, f, fields = radio.make_rates_command(jnp.float32(thrust[i]), jnp.asarray(angvel[i]))
        expect = radio.fields_to_bytes(int(t), int(f), np.asarray(fields))
        assert raw[i].tobytes() == expect, i


def test_radio_decode_roundtrip():
    rng = np.random.default_rng(1)
    n = 32
    thrust = rng.uniform(0, 30, n).astype(np.float32)
    angvel = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    raw = native.radio_encode_rates(thrust, angvel)
    types, flags, floats = native.radio_decode(raw)
    assert np.all(types == radio.TYPE_EXTERNAL_RATES_CMD)
    assert np.allclose(floats[:, 0], thrust, atol=2 * 35 / 32768)
    assert np.allclose(floats[:, 1:4], angvel, atol=2 * 35 / 32768)
    # cross-check against the jnp decoder
    for i in range(0, n, 7):
        _, _, fields = radio.bytes_to_fields(raw[i].tobytes())
        jf = radio.decode_message(jnp.int32(types[i]), jnp.asarray(fields))
        assert np.allclose(np.asarray(jf), floats[i], atol=1e-6)


def test_telemetry_pack_roundtrip():
    rng = np.random.default_rng(2)
    n = 16
    types = rng.integers(0, 2, n).astype(np.uint8)
    nums = rng.integers(0, 256, n).astype(np.uint8)
    data = rng.integers(0, 65536, (n, 14)).astype(np.uint16)
    raw = native.telemetry_pack(types, nums, data)
    t2, n2, d2 = native.telemetry_unpack(raw)
    assert np.array_equal(t2, types)
    assert np.array_equal(n2, nums)
    assert np.array_equal(d2, data)
    # matches the python packer
    for i in range(n):
        assert raw[i].tobytes() == telemetry.pack_bytes(int(types[i]), int(nums[i]), data[i].astype(np.int32))


def test_native_csv_logger(tmp_path):
    path = tmp_path / "log.csv"
    rows = np.array([[1.0, 2.5, -3.25], [4.0, 5.0, 6.125]])
    with native.NativeCsvLogger(path, "a,b,c") as lg:
        lg.write_rows(rows)
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "a,b,c"
    got = np.array([[float(x) for x in ln.split(",")] for ln in lines[1:]])
    assert np.allclose(got, rows)
