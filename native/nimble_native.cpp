// nimble_native: C++ host-side IO for nimble_tpu.
//
// The TPU engine consumes fixed-shape 2-bit-coded read batches; this library
// keeps the chips fed: zlib-backed FASTQ(.gz) streaming + base encoding at
// native speed (the reference delegates its hot path to a Rust binary; here
// the device does the alignment and C++ does the IO).
//
// Exposed as a plain-C ABI for ctypes. No Python.h dependency.
//
// Build: make -C native   (produces libnimble_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <zlib.h>

namespace {

constexpr int8_t N_CODE = 4;

struct EncodeLut {
  int8_t lut[256];
  EncodeLut() {
    memset(lut, N_CODE, sizeof(lut));
    lut[(unsigned char)'A'] = 0;
    lut[(unsigned char)'a'] = 0;
    lut[(unsigned char)'C'] = 1;
    lut[(unsigned char)'c'] = 1;
    lut[(unsigned char)'G'] = 2;
    lut[(unsigned char)'g'] = 2;
    lut[(unsigned char)'T'] = 3;
    lut[(unsigned char)'t'] = 3;
    lut[(unsigned char)'U'] = 3;
    lut[(unsigned char)'u'] = 3;
  }
};
const EncodeLut kLut;

// Buffered gzFile line reader (gzgets is slow; we manage our own buffer).
struct Reader {
  gzFile f = nullptr;
  char *buf = nullptr;
  size_t cap = 0;     // buffer capacity
  size_t len = 0;     // valid bytes
  size_t pos = 0;     // cursor
  bool eof = false;

  bool fill() {
    if (eof) return len > pos;
    if (pos > 0) {
      memmove(buf, buf + pos, len - pos);
      len -= pos;
      pos = 0;
    }
    if (len == cap) {
      cap *= 2;
      buf = (char *)realloc(buf, cap);
    }
    int n = gzread(f, buf + len, (unsigned)(cap - len));
    if (n <= 0) {
      eof = true;
    } else {
      len += (size_t)n;
    }
    return len > pos;
  }

  // Returns pointer to the line (not NUL-terminated) and its length
  // (without the newline), or nullptr at EOF.
  const char *line(size_t *out_len) {
    for (;;) {
      char *nl = (char *)memchr(buf + pos, '\n', len - pos);
      if (nl != nullptr) {
        const char *start = buf + pos;
        size_t n = (size_t)(nl - start);
        pos = (size_t)(nl - buf) + 1;
        if (n > 0 && start[n - 1] == '\r') n--;
        *out_len = n;
        return start;
      }
      size_t before = len - pos;
      if (!fill() || (eof && len - pos == before)) {
        if (len > pos) {  // final unterminated line
          const char *start = buf + pos;
          *out_len = len - pos;
          pos = len;
          return start;
        }
        return nullptr;
      }
    }
  }
};

}  // namespace

extern "C" {

void *nt_fastq_open(const char *path) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return nullptr;
  gzbuffer(f, 1 << 20);
  Reader *r = new Reader();
  r->f = f;
  r->cap = 1 << 20;
  r->buf = (char *)malloc(r->cap);
  return r;
}

void nt_fastq_close(void *handle) {
  Reader *r = (Reader *)handle;
  if (r == nullptr) return;
  gzclose(r->f);
  free(r->buf);
  delete r;
}

// Read up to max_records FASTQ records.
//   codes:    int8  [max_records, max_len]  2-bit base codes, N_CODE padded
//   lens:     int32 [max_records]           clipped sequence lengths
//   raw:      char  [raw_cap]               packed name\0seq\0qual\0 triples
//   raw_offs: int64 [max_records*3]         offsets of name/seq/qual in raw
// Returns the number of records read (0 at EOF). Stops early when < 1 MiB
// of raw space remains, so callers should size raw_cap at
// max_records * (typical record size) + 1 MiB. A single record larger than
// 1 MiB returns -1 (fatal; caller raises).
int64_t nt_fastq_read_batch(void *handle, int64_t max_records, int64_t max_len,
                            int8_t *codes, int32_t *lens, char *raw,
                            int64_t raw_cap, int64_t *raw_offs) {
  Reader *r = (Reader *)handle;
  int64_t nrec = 0;
  int64_t raw_pos = 0;
  const int64_t kGuard = 1 << 20;
  while (nrec < max_records) {
    if (raw_cap - raw_pos < kGuard) break;
    size_t hlen, slen, plen, qlen;
    const char *h = r->line(&hlen);
    if (h == nullptr) break;
    // header: take first whitespace-delimited token after '@'
    const char *name = h + 1;
    size_t name_len = hlen > 0 ? hlen - 1 : 0;
    for (size_t i = 0; i < name_len; i++) {
      if (name[i] == ' ' || name[i] == '\t') {
        name_len = i;
        break;
      }
    }
    // copy name BEFORE subsequent line() calls invalidate the pointer
    if (raw_pos + (int64_t)name_len + 1 > raw_cap) return -1;
    raw_offs[nrec * 3 + 0] = raw_pos;
    memcpy(raw + raw_pos, name, name_len);
    raw[raw_pos + name_len] = 0;
    raw_pos += (int64_t)name_len + 1;

    const char *s = r->line(&slen);
    if (s == nullptr) break;
    if (raw_pos + (int64_t)slen + 1 > raw_cap) return -1;
    raw_offs[nrec * 3 + 1] = raw_pos;
    memcpy(raw + raw_pos, s, slen);
    raw[raw_pos + slen] = 0;
    // encode into the fixed-shape block
    int8_t *crow = codes + nrec * max_len;
    int64_t m = (int64_t)slen < max_len ? (int64_t)slen : max_len;
    const char *src = raw + raw_pos;  // stable copy
    for (int64_t i = 0; i < m; i++) crow[i] = kLut.lut[(unsigned char)src[i]];
    for (int64_t i = m; i < max_len; i++) crow[i] = N_CODE;
    lens[nrec] = (int32_t)m;
    raw_pos += (int64_t)slen + 1;

    const char *p = r->line(&plen);  // '+' separator
    (void)p;
    const char *q = r->line(&qlen);
    if (q == nullptr) qlen = 0;
    if (raw_pos + (int64_t)qlen + 1 > raw_cap) return -1;
    raw_offs[nrec * 3 + 2] = raw_pos;
    if (qlen > 0) memcpy(raw + raw_pos, q, qlen);
    raw[raw_pos + qlen] = 0;
    raw_pos += (int64_t)qlen + 1;

    nrec++;
  }
  return nrec;
}

// Vectorized batch base-encoding: seqs is a packed buffer of n sequences at
// given offsets/lengths -> codes [n, max_len] + lens [n].
void nt_encode_batch(const char *seqs, const int64_t *offs,
                     const int64_t *seq_lens, int64_t n, int64_t max_len,
                     int8_t *codes, int32_t *lens) {
  for (int64_t i = 0; i < n; i++) {
    const char *s = seqs + offs[i];
    int64_t m = seq_lens[i] < max_len ? seq_lens[i] : max_len;
    int8_t *row = codes + i * max_len;
    for (int64_t j = 0; j < m; j++) row[j] = kLut.lut[(unsigned char)s[j]];
    for (int64_t j = m; j < max_len; j++) row[j] = N_CODE;
    lens[i] = (int32_t)m;
  }
}

}  // extern "C"
