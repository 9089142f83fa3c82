"""Radio command wire codec.

The only channel from offboard to onboard is a 23-byte packet: 1 type byte,
1 reserved, 1 flags, then 10 big-endian uint16 scaled floats
(Common/Common/DataTypes/RadioTypes.hpp:39-248). The quantization is part of
sim fidelity — the onboard controller sees the decoded (lossy) command.

Two implementations:
  * device path (jnp): commands carried as (type:int32, flags:int32,
    u16 fields:(10,) int32). `encode_field`/`decode_field` reproduce the
    uint16 scaling exactly, so the jitted loop sees the same quantization
    error as the reference without materializing byte strings.
  * host path (numpy): full 23-byte packets for the AIFS_ROS-schema bridge.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# message types (RadioTypes.hpp:17-25)
TYPE_INVALID = 0
TYPE_RESERVED = 1
TYPE_EMERGENCY_KILL = 2
TYPE_POSITION_CMD = 3
TYPE_EXTERNAL_ACC_CMD = 4
TYPE_EXTERNAL_RATES_CMD = 5
TYPE_IDLE_CMD = 6

# reserved flag bits (RadioTypes.hpp:28-37)
FLAG_CALIBRATE_MOTORS = 0x01
FLAG_DISABLE_SAFETY_CHECKS = 0x02

# field scaling limits (RadioTypes.hpp:54-61)
MAX_CMD_THRUST = 35.0
MAX_CMD_ANG_RATES = 35.0
MAX_CMD_POS = 20.0
MAX_CMD_VEL = 10.0
MAX_CMD_ACC = 30.0
MAX_DEFAULT = 1.0

NUM_FIELDS = 10
_HALF = 32768  # 2^15
_MAX = 65536

RAW_PACKET_SIZE = 23


def encode_field(val, limit):
    """float -> uint16 code, matching encodeToRadioByte (RadioTypes.hpp:75-98)."""
    val = jnp.asarray(val, jnp.float32)
    in_range = (val > -limit) & (val < limit)
    code = (val * _HALF / limit + 0.5).astype(jnp.int32) + _HALF
    hi = val >= limit  # saturate high (also NaN-safe: NaN fails all compares -> 0)
    out = jnp.where(in_range, code, jnp.where(hi, _MAX - 1, 0))
    return out.astype(jnp.int32)


def decode_field(code, limit):
    """uint16 code -> float, matching decodeFromRadioBytes (RadioTypes.hpp:100-113)."""
    return limit * (code.astype(jnp.float32) - _HALF) / float(_HALF)


def quantize(val, limit):
    """Round-trip a float through the wire quantization."""
    return decode_field(encode_field(val, limit), limit)


def make_rates_command(thrust, ang_vel, flags=0):
    """Device-side rates command: fields[0]=thrust, 1:4=angvel (RadioTypes.hpp:160-175).

    Built by concatenation, not .at[] updates — static-index scatters don't
    lower inside the Pallas fused-tick kernel that traces this codec."""
    fields = jnp.concatenate([
        encode_field(thrust, MAX_CMD_THRUST).reshape(1),
        encode_field(ang_vel, MAX_CMD_ANG_RATES).reshape(3),
        jnp.zeros(NUM_FIELDS - 4, jnp.int32),
    ])
    return jnp.int32(TYPE_EXTERNAL_RATES_CMD), jnp.asarray(flags, jnp.int32), fields


def make_position_command(des_pos, des_vel, des_acc, flags=0):
    fields = jnp.concatenate([
        encode_field(des_pos, MAX_CMD_POS).reshape(3),
        encode_field(des_vel, MAX_CMD_VEL).reshape(3),
        encode_field(des_acc, MAX_CMD_ACC).reshape(3),
        jnp.zeros(NUM_FIELDS - 9, jnp.int32),
    ])
    return jnp.int32(TYPE_POSITION_CMD), jnp.asarray(flags, jnp.int32), fields


def make_acceleration_command(acc, yaw_rate, flags=0):
    fields = jnp.concatenate([
        encode_field(acc, MAX_CMD_ACC).reshape(3),
        encode_field(yaw_rate, MAX_CMD_ANG_RATES).reshape(1),
        jnp.zeros(NUM_FIELDS - 4, jnp.int32),
    ])
    return jnp.int32(TYPE_EXTERNAL_ACC_CMD), jnp.asarray(flags, jnp.int32), fields


def make_kill_command(flags=0):
    return jnp.int32(TYPE_EMERGENCY_KILL), jnp.asarray(flags, jnp.int32), jnp.zeros((NUM_FIELDS,), jnp.int32)


def make_idle_command(flags=0):
    return jnp.int32(TYPE_IDLE_CMD), jnp.asarray(flags, jnp.int32), jnp.zeros((NUM_FIELDS,), jnp.int32)


def decode_message(msg_type, fields):
    """uint16 codes -> 10 floats, per-type limits (RadioTypes.hpp:189-240).

    Works under jit for traced msg_type: computes all decodings and selects.
    """
    f_pos = jnp.concatenate(
        [
            decode_field(fields[0:3], MAX_CMD_POS),
            decode_field(fields[3:6], MAX_CMD_VEL),
            decode_field(fields[6:9], MAX_CMD_ACC),
            decode_field(fields[9:10], MAX_DEFAULT),
        ]
    )
    f_rates = jnp.concatenate(
        [
            decode_field(fields[0:1], MAX_CMD_THRUST),
            decode_field(fields[1:10], MAX_CMD_ANG_RATES),
        ]
    )
    f_acc = jnp.concatenate(
        [
            decode_field(fields[0:3], MAX_CMD_ACC),
            decode_field(fields[3:4], MAX_CMD_ANG_RATES),
            decode_field(fields[4:10], MAX_DEFAULT),
        ]
    )
    f_default = decode_field(fields, MAX_DEFAULT)
    out = jnp.where(msg_type == TYPE_POSITION_CMD, f_pos, f_default)
    out = jnp.where(msg_type == TYPE_EXTERNAL_RATES_CMD, f_rates, out)
    out = jnp.where(msg_type == TYPE_EXTERNAL_ACC_CMD, f_acc, out)
    return out


# ----------------------------------------------------------------------------
# host-side byte packets (for the ROS-schema bridge / logging)
# ----------------------------------------------------------------------------

def fields_to_bytes(msg_type: int, flags: int, fields: np.ndarray) -> bytes:
    """Pack into the 23-byte wire format (big-endian u16 fields)."""
    raw = np.zeros(RAW_PACKET_SIZE, np.uint8)
    raw[0] = msg_type
    raw[1] = 0
    raw[2] = flags
    f = np.asarray(fields, np.int64)
    raw[3::2] = (f >> 8) & 0xFF
    raw[4::2] = f & 0xFF
    return raw.tobytes()


def bytes_to_fields(raw: bytes):
    b = np.frombuffer(raw, np.uint8)
    msg_type, flags = int(b[0]), int(b[2])
    fields = (b[3::2].astype(np.int64) << 8) + b[4::2].astype(np.int64)
    return msg_type, flags, fields.astype(np.int32)
