// Native host runtime for agrifly_tpu: wire codecs + high-rate logging.
//
// Plays the role the reference's C++ plays *around* the compute path: the
// host-side byte-level work (23-byte radio packets, 30-byte telemetry
// packets, CSV state logging at 500 Hz x fleet) runs in C++, while the
// device compute path stays JAX/XLA/Pallas. Exposed as a plain C ABI and
// loaded from Python via ctypes (agrifly_tpu/io/native.py).
//
// Wire formats match Common/Common/DataTypes/RadioTypes.hpp and
// TelemetryPacket.hpp bit-for-bit (big-endian u16 radio fields; packed
// little-endian u16 telemetry data words).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kRadioPacket = 23;
constexpr int kNumFields = 10;
constexpr int kHalf = 32768;

// per-type field limits
constexpr float kMaxThrust = 35.0f;
constexpr float kMaxRates = 35.0f;
constexpr float kMaxPos = 20.0f;
constexpr float kMaxVel = 10.0f;
constexpr float kMaxAcc = 30.0f;
constexpr float kMaxDefault = 1.0f;

enum RadioType : uint8_t {
  kInvalid = 0,
  kEmergencyKill = 2,
  kPositionCmd = 3,
  kExternalAccCmd = 4,
  kExternalRatesCmd = 5,
  kIdleCmd = 6,
};

uint16_t EncodeField(float v, float limit) {
  if (v > -limit && v < limit) {
    return static_cast<uint16_t>(static_cast<int>(v * kHalf / limit + 0.5f) + kHalf);
  }
  if (v >= limit) return 65535;
  return 0;  // below -limit, or NaN
}

float DecodeField(uint16_t code, float limit) {
  return limit * (static_cast<int>(code) - kHalf) / static_cast<float>(kHalf);
}

void PutField(uint8_t* pkt, int idx, uint16_t code) {
  pkt[3 + 2 * idx] = static_cast<uint8_t>(code >> 8);
  pkt[3 + 2 * idx + 1] = static_cast<uint8_t>(code & 0xFF);
}

uint16_t GetField(const uint8_t* pkt, int idx) {
  return static_cast<uint16_t>((pkt[3 + 2 * idx] << 8) | pkt[3 + 2 * idx + 1]);
}

float FieldLimit(uint8_t type, int idx) {
  switch (type) {
    case kPositionCmd:
      if (idx < 3) return kMaxPos;
      if (idx < 6) return kMaxVel;
      if (idx < 9) return kMaxAcc;
      return kMaxDefault;
    case kExternalRatesCmd:
      return idx == 0 ? kMaxThrust : kMaxRates;
    case kExternalAccCmd:
      if (idx < 3) return kMaxAcc;
      if (idx == 3) return kMaxRates;
      return kMaxDefault;
    default:
      return kMaxDefault;
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// radio codec (batch)
// ---------------------------------------------------------------------------

void af_radio_encode_rates(const float* thrust, const float* angvel, int n,
                           uint8_t flags, uint8_t* out) {
  for (int i = 0; i < n; i++) {
    uint8_t* pkt = out + i * kRadioPacket;
    std::memset(pkt, 0, kRadioPacket);
    pkt[0] = kExternalRatesCmd;
    pkt[2] = flags;
    PutField(pkt, 0, EncodeField(thrust[i], kMaxThrust));
    for (int a = 0; a < 3; a++) {
      PutField(pkt, 1 + a, EncodeField(angvel[i * 3 + a], kMaxRates));
    }
  }
}

void af_radio_encode_position(const float* pos, const float* vel,
                              const float* acc, int n, uint8_t flags,
                              uint8_t* out) {
  for (int i = 0; i < n; i++) {
    uint8_t* pkt = out + i * kRadioPacket;
    std::memset(pkt, 0, kRadioPacket);
    pkt[0] = kPositionCmd;
    pkt[2] = flags;
    for (int a = 0; a < 3; a++) {
      PutField(pkt, a, EncodeField(pos[i * 3 + a], kMaxPos));
      PutField(pkt, 3 + a, EncodeField(vel[i * 3 + a], kMaxVel));
      PutField(pkt, 6 + a, EncodeField(acc[i * 3 + a], kMaxAcc));
    }
  }
}

void af_radio_encode_simple(uint8_t type, int n, uint8_t flags, uint8_t* out) {
  for (int i = 0; i < n; i++) {
    uint8_t* pkt = out + i * kRadioPacket;
    std::memset(pkt, 0, kRadioPacket);
    pkt[0] = type;
    pkt[2] = flags;
  }
}

void af_radio_decode(const uint8_t* raw, int n, int32_t* types, int32_t* flags,
                     float* floats) {
  for (int i = 0; i < n; i++) {
    const uint8_t* pkt = raw + i * kRadioPacket;
    types[i] = pkt[0];
    flags[i] = pkt[2];
    for (int f = 0; f < kNumFields; f++) {
      floats[i * kNumFields + f] =
          DecodeField(GetField(pkt, f), FieldLimit(pkt[0], f));
    }
  }
}

// ---------------------------------------------------------------------------
// telemetry codec (batch): 30-byte packets, 14 u16 data words
// ---------------------------------------------------------------------------

void af_telemetry_pack(const uint8_t* type, const uint8_t* packet_number,
                       const uint16_t* data /*14n*/, int n, uint8_t* out) {
  for (int i = 0; i < n; i++) {
    uint8_t* pkt = out + i * 30;
    pkt[0] = type[i];
    pkt[1] = packet_number[i];
    std::memcpy(pkt + 2, data + i * 14, 28);
  }
}

void af_telemetry_unpack(const uint8_t* raw, int n, uint8_t* type,
                         uint8_t* packet_number, uint16_t* data) {
  for (int i = 0; i < n; i++) {
    const uint8_t* pkt = raw + i * 30;
    type[i] = pkt[0];
    packet_number[i] = pkt[1];
    std::memcpy(data + i * 14, pkt + 2, 28);
  }
}

// ---------------------------------------------------------------------------
// high-rate CSV logger (the demo writes wide CSV rows every offboard tick:
// Rappids_Simulator/main.cpp:258-270,676-733)
// ---------------------------------------------------------------------------

struct Logger {
  FILE* f;
  std::vector<char> buf;
};

void* af_logger_open(const char* path, const char* header) {
  FILE* f = std::fopen(path, "w");
  if (!f) return nullptr;
  auto* lg = new Logger{f, {}};
  lg->buf.reserve(1 << 20);
  std::setvbuf(f, nullptr, _IOFBF, 1 << 20);
  if (header && header[0]) {
    std::fputs(header, f);
    std::fputc('\n', f);
  }
  return lg;
}

void af_logger_write_rows(void* handle, const double* rows, int nrows,
                          int ncols) {
  auto* lg = static_cast<Logger*>(handle);
  if (!lg) return;
  char tmp[32];
  for (int r = 0; r < nrows; r++) {
    const double* row = rows + r * ncols;
    for (int c = 0; c < ncols; c++) {
      int len = std::snprintf(tmp, sizeof(tmp), "%.9g", row[c]);
      std::fwrite(tmp, 1, len, lg->f);
      std::fputc(c + 1 == ncols ? '\n' : ',', lg->f);
    }
  }
}

void af_logger_close(void* handle) {
  auto* lg = static_cast<Logger*>(handle);
  if (!lg) return;
  std::fclose(lg->f);
  delete lg;
}

}  // extern "C"
