// Native HITRAN .par parser (C++ equivalent of the reference's
// gas-optics/src/parse_HITRAN_file.c hot path).
//
// Parses 160-character fixed-width HITRAN2012/2016 records for one
// molecule, optionally filtered to a line-center window, into caller-
// provided arrays.  The 296 K strength renormalization stays on the
// Python side (it needs the TIPS provider); this library only does the
// byte -> number heavy lifting, which dominates wall time for the
// ~700 MB production databases (4.5M+ records).
//
// Build: make -C native hitran  (produces libgrtcode_hitran.so)
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// Fixed-width field layout (parse_HITRAN_file.c HITRAN2012_fmt).
constexpr int kRecordLen = 160;
constexpr int kMolPos = 0, kMolLen = 2;
constexpr int kIsoPos = 2;
constexpr int kVnnPos = 3, kVnnLen = 12;
constexpr int kSnnPos = 15, kSnnLen = 10;
constexpr int kYairPos = 35, kYairLen = 5;
constexpr int kYselfPos = 40, kYselfLen = 5;
constexpr int kEnPos = 45, kEnLen = 10;
constexpr int kNPos = 55, kNLen = 4;
constexpr int kDPos = 59, kDLen = 8;

double field(const char* rec, int pos, int len) {
  char buf[16];
  std::memcpy(buf, rec + pos, len);
  buf[len] = '\0';
  return std::strtod(buf, nullptr);
}

// Hex-like isotopologue code: '0' -> 10, 'A' -> 11, ...
// (parse_HITRAN_file.c:176-194).
int iso_code(char c) {
  if (c == '0') return 10;
  if (c >= 'A' && c <= 'Z') return c - 'A' + 11;
  return c - '0';
}

}  // namespace

extern "C" {

// Returns the number of records parsed (>= 0), or a negative error code:
// -1 file open failure, -2 short/garbled record, -3 capacity exceeded.
// Records whose molecule id != mol_id are skipped; when w0 <= wn the
// line-center window [w0, wn] filters inclusively (pass w0 > wn to
// disable).  Arrays must hold at least `capacity` elements.
int64_t grt_parse_par(const char* path, int mol_id, double w0, double wn,
                      int64_t capacity, int32_t* iso, double* vnn,
                      double* s0, double* yair, double* yself, double* en,
                      double* n_exp, double* d) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  char line[kRecordLen + 8];
  char molbuf[kMolLen + 1];
  int64_t count = 0;
  // Read in whole lines; records may end with \n or \r\n.
  char buf[kRecordLen + 3];
  while (std::fgets(buf, sizeof(buf), f)) {
    size_t len = std::strlen(buf);
    while (len > 0 && (buf[len - 1] == '\n' || buf[len - 1] == '\r')) {
      buf[--len] = '\0';
    }
    if (len == 0) continue;
    if (len < kRecordLen) {
      std::fclose(f);
      return -2;
    }
    std::memcpy(line, buf, kRecordLen);
    line[kRecordLen] = '\0';

    std::memcpy(molbuf, line + kMolPos, kMolLen);
    molbuf[kMolLen] = '\0';
    if (std::atoi(molbuf) != mol_id) continue;

    double v = field(line, kVnnPos, kVnnLen);
    if (w0 <= wn && (v < w0 || v > wn)) continue;

    if (count >= capacity) {
      std::fclose(f);
      return -3;
    }
    iso[count] = iso_code(line[kIsoPos]);
    vnn[count] = v;
    s0[count] = field(line, kSnnPos, kSnnLen);
    yair[count] = field(line, kYairPos, kYairLen);
    yself[count] = field(line, kYselfPos, kYselfLen);
    en[count] = field(line, kEnPos, kEnLen);
    n_exp[count] = field(line, kNPos, kNLen);
    d[count] = field(line, kDPos, kDLen);
    ++count;
  }
  std::fclose(f);
  return count;
}

}  // extern "C"
