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

// ---------------------------------------------------------------------------
// BAM batch reader: BGZF (gzip-member) stream -> fixed-shape code batches.
// Parses records, 4-bit-unpacks sequences straight into 2-bit codes, and
// extracts CB/UB/GN string tags + flag/pos. Replaces the Python BamReader on
// the hot scRNA-seq input path.
// ---------------------------------------------------------------------------

namespace {

const int8_t kNibToCode[16] = {
    // = A C M G R S V T W Y H K D B N
    N_CODE, 0, 1, N_CODE, 2, N_CODE, N_CODE, N_CODE,
    3, N_CODE, N_CODE, N_CODE, N_CODE, N_CODE, N_CODE, N_CODE};

struct BamReaderC {
  gzFile f = nullptr;
  // carry buffer for partial records across read calls
  uint8_t *buf = nullptr;
  size_t cap = 0;
  size_t len = 0;
  size_t pos = 0;
  bool eof = false;
  bool header_done = false;

  bool ensure(size_t need) {
    while (len - pos < need) {
      if (eof) return false;
      if (pos > 0) {
        memmove(buf, buf + pos, len - pos);
        len -= pos;
        pos = 0;
      }
      if (cap - len < (1u << 20)) {
        cap = cap * 2 + (1u << 20);
        buf = (uint8_t *)realloc(buf, cap);
      }
      int n = gzread(f, buf + len, (unsigned)(cap - len));
      if (n <= 0) {
        eof = true;
      } else {
        len += (size_t)n;
      }
    }
    return true;
  }

  bool skip_header() {
    if (!ensure(12)) return false;
    if (memcmp(buf + pos, "BAM\x01", 4) != 0) return false;
    int32_t l_text;
    memcpy(&l_text, buf + pos + 4, 4);
    pos += 8;
    if (!ensure((size_t)l_text + 4)) return false;
    pos += (size_t)l_text;
    int32_t n_ref;
    memcpy(&n_ref, buf + pos, 4);
    pos += 4;
    for (int32_t i = 0; i < n_ref; i++) {
      if (!ensure(4)) return false;
      int32_t l_name;
      memcpy(&l_name, buf + pos, 4);
      pos += 4;
      if (!ensure((size_t)l_name + 4)) return false;
      pos += (size_t)l_name + 4;
    }
    header_done = true;
    return true;
  }
};

}  // namespace

extern "C" {

void *nt_bam_open(const char *path) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return nullptr;
  gzbuffer(f, 1 << 22);
  BamReaderC *r = new BamReaderC();
  r->f = f;
  r->cap = 1 << 22;
  r->buf = (uint8_t *)malloc(r->cap);
  if (!r->skip_header()) {
    gzclose(f);
    free(r->buf);
    delete r;
    return nullptr;
  }
  return r;
}

void nt_bam_close(void *handle) {
  BamReaderC *r = (BamReaderC *)handle;
  if (r == nullptr) return;
  gzclose(r->f);
  free(r->buf);
  delete r;
}

// Read up to max_records primary BAM records (secondary/supplementary
// skipped). Outputs per record:
//   codes  int8  [max_records, max_len]
//   lens   int32 [max_records]
//   flags  int32 [max_records]
//   poss   int32 [max_records]
//   raw    char  [raw_cap]   name\0 CB\0 UB\0 GN\0 per record
//   raw_offs int64 [max_records*4]
// Returns count (0 at EOF), or -1 on malformed input / raw overflow.
int64_t nt_bam_read_batch(void *handle, int64_t max_records, int64_t max_len,
                          int8_t *codes, int32_t *lens, int32_t *flags,
                          int32_t *poss, char *raw, int64_t raw_cap,
                          int64_t *raw_offs) {
  BamReaderC *r = (BamReaderC *)handle;
  int64_t nrec = 0;
  int64_t raw_pos = 0;
  const int64_t kGuard = 1 << 20;
  while (nrec < max_records) {
    if (raw_cap - raw_pos < kGuard) break;
    if (!r->ensure(4)) break;
    int32_t block_size;
    memcpy(&block_size, r->buf + r->pos, 4);
    if (block_size < 32) return -1;
    if (!r->ensure(4 + (size_t)block_size)) break;
    const uint8_t *rec = r->buf + r->pos + 4;
    r->pos += 4 + (size_t)block_size;

    int32_t pos_field;
    memcpy(&pos_field, rec + 4, 4);
    uint8_t l_read_name = rec[8];
    uint16_t n_cigar;
    memcpy(&n_cigar, rec + 12, 2);
    uint16_t flag;
    memcpy(&flag, rec + 14, 2);
    int32_t l_seq;
    memcpy(&l_seq, rec + 16, 4);
    if (flag & 0x100 || flag & 0x800) continue;  // secondary/supplementary

    const uint8_t *p = rec + 32;
    const char *name = (const char *)p;
    size_t name_len = l_read_name > 0 ? (size_t)l_read_name - 1 : 0;
    p += l_read_name;
    p += 4 * (size_t)n_cigar;
    const uint8_t *seq_nibs = p;
    p += (l_seq + 1) / 2;
    p += l_seq;  // qualities (skipped)
    const uint8_t *tags = p;
    const uint8_t *tags_end = rec + block_size;

    // decode sequence nibbles -> 2-bit codes
    int8_t *crow = codes + nrec * max_len;
    int64_t m = l_seq < max_len ? l_seq : max_len;
    for (int64_t i = 0; i < m; i++) {
      uint8_t nib = (i % 2 == 0) ? (seq_nibs[i / 2] >> 4) : (seq_nibs[i / 2] & 0xF);
      crow[i] = kNibToCode[nib];
    }
    for (int64_t i = m; i < max_len; i++) crow[i] = N_CODE;
    lens[nrec] = (int32_t)m;
    flags[nrec] = flag;
    poss[nrec] = pos_field;

    // name
    raw_offs[nrec * 4 + 0] = raw_pos;
    memcpy(raw + raw_pos, name, name_len);
    raw[raw_pos + name_len] = 0;
    raw_pos += (int64_t)name_len + 1;

    // CB / UB / GN tags (Z type); emit empty strings when absent
    const char *want[3] = {"CB", "UB", "GN"};
    const uint8_t *found[3] = {nullptr, nullptr, nullptr};
    size_t found_len[3] = {0, 0, 0};
    const uint8_t *t = tags;
    while (t + 3 <= tags_end) {
      char key0 = (char)t[0], key1 = (char)t[1];
      char typ = (char)t[2];
      t += 3;
      size_t vlen = 0;
      if (typ == 'Z' || typ == 'H') {
        const uint8_t *z = t;
        while (z < tags_end && *z != 0) z++;
        vlen = (size_t)(z - t);
        for (int w = 0; w < 3; w++) {
          if (key0 == want[w][0] && key1 == want[w][1]) {
            found[w] = t;
            found_len[w] = vlen;
          }
        }
        t = z + 1;
      } else if (typ == 'A' || typ == 'c' || typ == 'C') {
        t += 1;
      } else if (typ == 's' || typ == 'S') {
        t += 2;
      } else if (typ == 'i' || typ == 'I' || typ == 'f') {
        t += 4;
      } else if (typ == 'B') {
        if (t + 5 > tags_end) break;
        char sub = (char)t[0];
        int32_t cnt;
        memcpy(&cnt, t + 1, 4);
        size_t esz = (sub == 'c' || sub == 'C') ? 1 : (sub == 's' || sub == 'S') ? 2 : 4;
        t += 5 + (size_t)cnt * esz;
      } else {
        break;  // unknown tag type: stop parsing tags for this record
      }
    }
    for (int w = 0; w < 3; w++) {
      raw_offs[nrec * 4 + 1 + w] = raw_pos;
      if (found[w] != nullptr) {
        memcpy(raw + raw_pos, found[w], found_len[w]);
      }
      raw[raw_pos + (int64_t)found_len[w]] = 0;
      raw_pos += (int64_t)found_len[w] + 1;
    }

    nrec++;
  }
  return nrec;
}

}  // extern "C"
