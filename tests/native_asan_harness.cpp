// ASan/UBSan harness for the native SMF parser (tests/test_fuzz_smf.py).
//
// Reads length-prefixed records (uint32 BE length + bytes) from stdin and
// drives every native entry point on each: mvae_parse_smf plus the
// whole-corpus totals/rasterize path. Memory errors abort via
// -fno-sanitize-recover (nonzero exit + sanitizer report on stderr);
// a clean sweep exits 0 and prints "accepted rejected" counts.
//
// Added after an ASan-confirmed one-byte overread: a track whose final
// delta-time ends exactly at the MTrk boundary made the status-byte read
// in mvae_parse_smf step past the input buffer (fixed in smf_parser.cpp).

#include <cstdint>
#include <cstdio>
#include <vector>

extern "C" int32_t mvae_parse_smf(const uint8_t*, int64_t, int32_t*,
                                  int32_t, int32_t*, int32_t*, int32_t*);
extern "C" int32_t mvae_corpus_totals(const uint8_t*, const int64_t*,
                                      int32_t, int32_t, int32_t, int32_t,
                                      int32_t, int32_t, int64_t*);
extern "C" int32_t mvae_corpus_rasterize(const uint8_t*, const int64_t*,
                                         int32_t, int32_t, int32_t, int32_t,
                                         int32_t, int32_t, const int64_t*,
                                         uint8_t*);

int main() {
  constexpr int32_t kMaxNotes = 65536;
  std::vector<int32_t> notes(static_cast<size_t>(kMaxNotes) * 4);
  int accepted = 0, rejected = 0;
  for (;;) {
    uint8_t hdr[4];
    if (fread(hdr, 1, 4, stdin) != 4) break;
    uint32_t len = (uint32_t(hdr[0]) << 24) | (uint32_t(hdr[1]) << 16) |
                   (uint32_t(hdr[2]) << 8) | uint32_t(hdr[3]);
    std::vector<uint8_t> buf(len);
    if (len && fread(buf.data(), 1, len, stdin) != len) return 2;
    int32_t tpq = 0, tempo = 0, ts[9];
    int32_t n = mvae_parse_smf(buf.data(), len, notes.data(), kMaxNotes,
                               &tpq, &tempo, ts);
    if (n >= 0) {
      ++accepted;
      int64_t offsets[2] = {0, static_cast<int64_t>(len)};
      int64_t total = 0;
      // strict_timesig=0 here: the harness drives the memory-safety
      // surface, and a strict pass would skip rasterize on non-4/4 fuzz
      // inputs (strict acceptance parity is covered in test_fuzz_smf.py)
      if (mvae_corpus_totals(buf.data(), offsets, 1, 24, 96, kMaxNotes, 1,
                             0, &total) == 0 && total > 0) {
        std::vector<uint8_t> roll(static_cast<size_t>(total) * 128, 0);
        int64_t roffs[2] = {0, total};
        mvae_corpus_rasterize(buf.data(), offsets, 1, 24, 96, kMaxNotes, 1,
                              0, roffs, roll.data());
      }
    } else {
      ++rejected;
    }
  }
  printf("%d %d\n", accepted, rejected);
  return 0;
}
