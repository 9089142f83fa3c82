"""Telemetry wire codec: 2 packets x 14 uint16 quantized fields.

Mirrors Common/Common/DataTypes/TelemetryPacket.hpp: floats are mapped from
per-field ranges to [-1,1], then to uint16 via 32768 + 32767*t (0 encodes
out-of-range and decodes to NaN). Packet 1 carries accel/gyro/motor forces/
position/battery; packet 2 velocity/attitude(vector part)/debug/panic/
warnings. Device-side arrays of int32 codes; byte packing for the host
bridge is in `pack_bytes`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

PACKET_TYPE_PT1 = 0
PACKET_TYPE_PT2 = 1
PACKET_TYPE_GENERIC_FLOAT = 100

# ranges (TelemetryPacket.hpp:80-98)
RANGE_ACC = (-30.0, 30.0)
RANGE_GYRO = (-35.0, 35.0)
RANGE_FORCE = (0.0, 10.0)
RANGE_BATT = (0.0, 15.0)
RANGE_POS = (-30.0, 30.0)
RANGE_VEL = (-30.0, 30.0)
RANGE_ATT = (-1.0, 1.0)
RANGE_GENERIC = (-100.0, 100.0)


class TelemetryPackets(NamedTuple):
    """Two wire packets as int arrays (type, packet_number, 14 codes each)."""

    type1: jnp.ndarray
    type2: jnp.ndarray
    packet_number: jnp.ndarray
    data1: jnp.ndarray  # (14,) int32
    data2: jnp.ndarray  # (14,) int32


def encode_ones(t):
    """[-1,1] float -> uint16 code; out-of-range -> 0 (hpp:55-63)."""
    t = jnp.asarray(t, jnp.float32)
    code = (32768.0 + 32767.0 * t).astype(jnp.int32)
    ok = (t >= -1.0) & (t <= 1.0)
    return jnp.where(ok, code, 0)


def decode_ones(code):
    """uint16 code -> float in [-1,1]; 0 -> NaN (hpp:66-71)."""
    val = (code.astype(jnp.float32) - 32768.0) / 32768.0
    return jnp.where(code == 0, jnp.nan, val)


def _to_ones(x, rng):
    a, b = rng
    return ((x - a) / (b - a)) * 2.0 - 1.0


def _from_ones(t, rng):
    a, b = rng
    return ((t + 1.0) / 2.0) * (b - a) + a


def encode_from_logic(logic_state) -> tuple:
    """Build both telemetry packets from a LogicState.

    Returns (packets, new_logic_state) — warnings are cleared after being
    sent, and the packet counter advances (QuadcopterLogic.cpp:621-679).
    """
    from agrifly_tpu.ops import filters
    from agrifly_tpu.ops import rotation as rot

    s = logic_state
    acc = filters.lp2_value(s.acc_lp)
    gyro = filters.lp2_value(s.gyro_lp)

    d1 = jnp.concatenate(
        [
            encode_ones(_to_ones(acc, RANGE_ACC)),
            encode_ones(_to_ones(gyro, RANGE_GYRO)),
            encode_ones(_to_ones(s.des_motor_forces, RANGE_FORCE)),
            encode_ones(_to_ones(s.kf.pos, RANGE_POS)),
            encode_ones(_to_ones(s.batt_voltage, RANGE_BATT))[None],
        ]
    ).astype(jnp.int32)

    att_vec = rot.to_vector_part(s.kf.att)
    d2 = jnp.concatenate(
        [
            encode_ones(_to_ones(s.kf.vel, RANGE_VEL)),
            encode_ones(_to_ones(att_vec, RANGE_ATT)),
            encode_ones(_to_ones(s.debug, RANGE_GENERIC)),
            s.panic_reason[None],
            s.warnings[None],
        ]
    ).astype(jnp.int32)

    pkts = TelemetryPackets(
        type1=jnp.int32(PACKET_TYPE_PT1),
        type2=jnp.int32(PACKET_TYPE_PT2),
        packet_number=(s.tel_counter % 256).astype(jnp.int32),
        data1=d1,
        data2=d2,
    )
    new_state = s._replace(tel_counter=s.tel_counter + 1, warnings=jnp.int32(0))
    return pkts, new_state


class DecodedTelemetry(NamedTuple):
    accel: jnp.ndarray
    gyro: jnp.ndarray
    motor_forces: jnp.ndarray
    position: jnp.ndarray
    batt_voltage: jnp.ndarray
    velocity: jnp.ndarray
    attitude: jnp.ndarray  # vector part of quaternion
    debug: jnp.ndarray
    panic_reason: jnp.ndarray
    warnings: jnp.ndarray


def decode(pkts: TelemetryPackets) -> DecodedTelemetry:
    d1, d2 = pkts.data1, pkts.data2
    return DecodedTelemetry(
        accel=_from_ones(decode_ones(d1[0:3]), RANGE_ACC),
        gyro=_from_ones(decode_ones(d1[3:6]), RANGE_GYRO),
        motor_forces=_from_ones(decode_ones(d1[6:10]), RANGE_FORCE),
        position=_from_ones(decode_ones(d1[10:13]), RANGE_POS),
        batt_voltage=_from_ones(decode_ones(d1[13]), RANGE_BATT),
        velocity=_from_ones(decode_ones(d2[0:3]), RANGE_VEL),
        attitude=_from_ones(decode_ones(d2[3:6]), RANGE_ATT),
        debug=_from_ones(decode_ones(d2[6:12]), RANGE_GENERIC),
        panic_reason=d2[12],
        warnings=d2[13],
    )


def wire_quantize_np(x, rng):
    """Host-side (numpy) round trip through the telemetry wire
    quantization: `_from_ones(decode_ones(encode_ones(_to_ones(x))))`
    with the normalization done in f32, like the device codec on f32
    inputs. Used by the orchard topic bridge, which builds its telemetry
    messages from host-resident frame rows (one device transfer already
    paid) instead of dispatching the jitted codec per packet."""
    a, b = rng
    # per-element ranges supported (the bridge quantizes a whole
    # telemetry row's 26 values in ONE call); all arithmetic stays
    # elementwise f32, so vector a/b is value-identical to scalar calls
    a32 = np.asarray(a, np.float32)
    span32 = (np.asarray(b, np.float64) - np.asarray(a, np.float64)) \
        .astype(np.float32)  # == np.float32(b - a) elementwise
    x32 = np.asarray(x, np.float32)
    t32 = ((x32 - a32) / span32) * np.float32(2.0) - np.float32(1.0)
    code = (32768.0 + 32767.0 * t32).astype(np.int32)
    code = np.where((t32 >= -1.0) & (t32 <= 1.0), code, 0)
    # de-normalize in f32 like the device decode path (_from_ones on f32)
    # and bridge._tel_from_codes_np, widening to f64 only at the end —
    # OrchardBridge values must match SimBridge/device-decoded values
    # bit-for-bit, not within an f32 ulp.
    val = np.where(code == 0, np.float32(np.nan),
                   (code.astype(np.float32) - np.float32(32768.0))
                   / np.float32(32768.0)).astype(np.float32)
    out = (((val + np.float32(1.0)) / np.float32(2.0)) * span32 + a32)
    return out.astype(np.float64)


def pack_bytes(ptype: int, packet_number: int, data: np.ndarray) -> bytes:
    """Host-side: pack one packet into the 30-byte wire struct."""
    out = np.zeros(30, np.uint8)
    out[0] = ptype
    out[1] = packet_number
    out[2:30] = np.asarray(data, np.uint16).view(np.uint8)[: 28]
    return out.tobytes()


def unpack_bytes(raw: bytes):
    b = np.frombuffer(raw, np.uint8)
    return int(b[0]), int(b[1]), b[2:30].view(np.uint16).astype(np.int32)


def encode_float_packet(floats) -> TelemetryPackets:
    """Generic float packet: up to 14 floats in [-1,1]
    (TelemetryPacket.hpp:243-268). Returns a packet pair with data2 unused."""
    floats = jnp.asarray(floats, jnp.float32)
    n = floats.shape[0]
    padded = jnp.zeros(14, jnp.float32).at[:n].set(floats[:14])
    codes = encode_ones(padded)
    # unused trailing slots encode 0.0 (valid), matching the reference fill
    return TelemetryPackets(
        type1=jnp.int32(PACKET_TYPE_GENERIC_FLOAT),
        type2=jnp.int32(PACKET_TYPE_GENERIC_FLOAT),
        packet_number=jnp.int32(0),
        data1=codes.astype(jnp.int32),
        data2=jnp.zeros(14, jnp.int32),
    )


def decode_float_packet(pkts: TelemetryPackets, num_floats=14):
    """Inverse of encode_float_packet (values in [-1,1]; 0-code -> NaN)."""
    return decode_ones(pkts.data1[:num_floats])
