"""Radio + telemetry wire codecs: quantization exactness and round trips."""

import numpy as np
import jax.numpy as jnp

from agrifly_tpu.io import radio, telemetry


def test_radio_field_quantization_reference_formula():
    # encode: int(v * 32768 / limit + 0.5) + 32768 (C++ int() truncates
    # toward zero); decode: limit * (code - 32768) / 32768
    limit = 35.0
    for v in [0.0, 1.234, -1.234, 34.99, -34.99, 0.0005, -0.0005]:
        code = int(radio.encode_field(jnp.float32(v), limit))
        expect = int(np.float32(v) * 32768 / limit + 0.5) + 32768
        assert code == expect, (v, code, expect)
        dec = float(radio.decode_field(jnp.int32(code), limit))
        # truncation toward zero costs up to a full step on negatives
        assert abs(dec - v) <= 2 * limit / 32768


def test_radio_field_saturation_and_nan():
    assert int(radio.encode_field(jnp.float32(100.0), 35.0)) == 65535
    assert int(radio.encode_field(jnp.float32(-100.0), 35.0)) == 0
    assert int(radio.encode_field(jnp.float32(np.nan), 35.0)) == 0


def test_rates_command_roundtrip():
    t, f, fields = radio.make_rates_command(jnp.float32(12.5), jnp.array([1.0, -2.0, 0.5]))
    assert int(t) == radio.TYPE_EXTERNAL_RATES_CMD
    floats = radio.decode_message(t, fields)
    assert abs(float(floats[0]) - 12.5) < 2 * 35 / 32768
    # C++ int() truncates toward zero -> up to one full step of error
    assert np.allclose(np.asarray(floats[1:4]), [1.0, -2.0, 0.5], atol=2 * 35 / 32768)


def test_position_command_roundtrip():
    t, f, fields = radio.make_position_command(
        jnp.array([1.5, -2.5, 3.0]), jnp.array([0.5, 0.0, -0.5]), jnp.zeros(3)
    )
    floats = radio.decode_message(t, fields)
    assert np.allclose(np.asarray(floats[0:3]), [1.5, -2.5, 3.0], atol=2 * 20 / 32768)
    assert np.allclose(np.asarray(floats[3:6]), [0.5, 0.0, -0.5], atol=2 * 10 / 32768)


def test_radio_bytes_roundtrip():
    t, f, fields = radio.make_rates_command(jnp.float32(9.81), jnp.array([0.1, 0.2, -0.3]))
    raw = radio.fields_to_bytes(int(t), int(f), np.asarray(fields))
    assert len(raw) == radio.RAW_PACKET_SIZE == 23
    t2, f2, fields2 = radio.bytes_to_fields(raw)
    assert t2 == int(t) and f2 == int(f)
    assert np.array_equal(fields2, np.asarray(fields))


def test_telemetry_ones_range():
    # 0 encodes out-of-range and decodes to NaN
    assert int(telemetry.encode_ones(jnp.float32(2.0))) == 0
    assert np.isnan(float(telemetry.decode_ones(jnp.int32(0))))
    for v in [-1.0, -0.5, 0.0, 0.5, 0.99]:
        code = int(telemetry.encode_ones(jnp.float32(v)))
        dec = float(telemetry.decode_ones(jnp.int32(code)))
        assert abs(dec - v) < 2.0 / 32768


def test_telemetry_packets_from_logic_state():
    from agrifly_tpu.models import constants as qconst
    from agrifly_tpu.models import logic as onboard

    p = onboard.make_params(qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD))
    s = onboard.init_state(p)
    s = s._replace(
        kf=s.kf._replace(pos=jnp.array([1.0, -2.0, 3.0]), vel=jnp.array([0.5, 0.0, -0.5])),
        des_motor_forces=jnp.array([0.3, 0.31, 0.29, 0.3]),
        batt_voltage=jnp.float32(7.4),
        warnings=jnp.int32(0x05),
        panic_reason=jnp.int32(2),
    )
    pkts, s2 = telemetry.encode_from_logic(s)
    dec = telemetry.decode(pkts)
    assert np.allclose(np.asarray(dec.position), [1.0, -2.0, 3.0], atol=60 / 32768 + 1e-4)
    assert np.allclose(np.asarray(dec.velocity), [0.5, 0.0, -0.5], atol=60 / 32768 + 1e-4)
    assert np.allclose(np.asarray(dec.motor_forces), [0.3, 0.31, 0.29, 0.3], atol=10 / 32768 + 1e-4)
    assert abs(float(dec.batt_voltage) - 7.4) < 15 / 32768 + 1e-4
    assert int(dec.panic_reason) == 2
    assert int(dec.warnings) == 0x05
    # warnings cleared + counter advanced after sending
    assert int(s2.warnings) == 0
    assert int(s2.tel_counter) == 1


def test_telemetry_bytes_roundtrip():
    data = np.arange(14, dtype=np.int32) * 1000 + 7
    raw = telemetry.pack_bytes(1, 42, data)
    assert len(raw) == 30
    t, n, d = telemetry.unpack_bytes(raw)
    assert (t, n) == (1, 42)
    assert np.array_equal(d, data)
