// Minimal FLAC decoder (native component of speech_ssl_compression_tpu).
//
// The reference framework reads training/eval audio with torchaudio/soundfile
// (extract_feature.py:33, datasets/hubert_dataset.py, wav2vec2_dataset.py).
// This standalone C++ decoder provides the same capability without any
// Python audio dependency: it implements the FLAC bitstream per the format
// spec (RFC 9639): STREAMINFO parsing, frame headers, constant/verbatim/
// fixed/LPC subframes, Rice-coded residual partitions, and stereo
// decorrelation (left-side / right-side / mid-side).
//
// Exposed via a C ABI for ctypes (see ../../speech_ssl_compression_tpu/data/audio.py).
// Verification: the decoded PCM's MD5 is checked in Python against the MD5
// embedded in STREAMINFO.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  explicit BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  inline bool eof() const { return byte_pos >= size; }

  inline uint32_t read_bit() {
    if (byte_pos >= size) {
      error = true;
      return 0;
    }
    uint32_t bit = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) {
      bit_pos = 0;
      ++byte_pos;
    }
    return bit;
  }

  inline uint64_t read_bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  inline int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    // sign extend
    if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((1ull << n) - 1);
    return static_cast<int64_t>(v);
  }

  inline uint32_t read_unary() {
    uint32_t q = 0;
    while (!error && read_bit() == 0) ++q;
    return q;
  }

  void align_byte() {
    if (bit_pos != 0) {
      bit_pos = 0;
      ++byte_pos;
    }
  }
};

// UTF-8-style coded number used for frame/sample index (up to 36 bits).
uint64_t read_utf8_number(BitReader& br) {
  uint32_t b0 = static_cast<uint32_t>(br.read_bits(8));
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80) == 0) {
    return b0;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    br.error = true;
    return 0;
  }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = static_cast<uint32_t>(br.read_bits(8));
    if ((b & 0xC0) != 0x80) {
      br.error = true;
      return 0;
    }
    v = (v << 6) | (b & 0x3F);
  }
  return v;
}

bool decode_residual(BitReader& br, int predictor_order, int block_size,
                     int64_t* out /* block_size entries, warmup filled */) {
  uint32_t method = static_cast<uint32_t>(br.read_bits(2));
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t partition_order = static_cast<uint32_t>(br.read_bits(4));
  uint32_t partitions = 1u << partition_order;
  int samples_per_part = block_size >> partition_order;
  if (samples_per_part == 0) return false;

  int idx = predictor_order;
  for (uint32_t p = 0; p < partitions; ++p) {
    int count = samples_per_part - (p == 0 ? predictor_order : 0);
    if (count < 0) return false;
    uint32_t param = static_cast<uint32_t>(br.read_bits(param_bits));
    if (param == escape) {
      uint32_t raw_bits = static_cast<uint32_t>(br.read_bits(5));
      for (int i = 0; i < count; ++i) {
        out[idx++] = raw_bits ? br.read_signed(static_cast<int>(raw_bits)) : 0;
      }
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint64_t low = param ? br.read_bits(static_cast<int>(param)) : 0;
        uint64_t u = (static_cast<uint64_t>(q) << param) | low;
        out[idx++] = static_cast<int64_t>(u >> 1) ^ -static_cast<int64_t>(u & 1);
      }
    }
    if (br.error) return false;
  }
  return idx == block_size;
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
  out.assign(block_size, 0);
  if (br.read_bit() != 0) return false;  // mandatory zero bit
  uint32_t type = static_cast<uint32_t>(br.read_bits(6));
  int wasted = 0;
  if (br.read_bit()) wasted = static_cast<int>(br.read_unary()) + 1;
  int ebps = bps - wasted;
  if (ebps <= 0 || ebps > 33) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(ebps);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(ebps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0..4
    int order = static_cast<int>(type) - 8;
    if (order > block_size) return false;  // warmup would overrun out[]
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(ebps);
    if (!decode_residual(br, order, block_size, out.data())) return false;
    // fixed predictors (residual currently stored in out[order..])
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      switch (order) {
        case 0: pred = 0; break;
        case 1: pred = out[i - 1]; break;
        case 2: pred = 2 * out[i - 1] - out[i - 2]; break;
        case 3: pred = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4:
          pred = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                 out[i - 4];
          break;
      }
      out[i] += pred;
    }
  } else if (type >= 32) {  // LPC, order 1..32
    int order = static_cast<int>(type & 0x1F) + 1;
    if (order > block_size) return false;  // warmup would overrun out[]
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(ebps);
    uint32_t prec_code = static_cast<uint32_t>(br.read_bits(4));
    if (prec_code == 0xF) return false;
    int precision = static_cast<int>(prec_code) + 1;
    int shift = static_cast<int>(br.read_signed(5));
    if (shift < 0) return false;
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; ++i) coefs[i] = br.read_signed(precision);
    if (!decode_residual(br, order, block_size, out.data())) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coefs[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted > 0) {
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  }
  return !br.error;
}

const int kBlockSizes[16] = {0,    192,  576,  1152, 2304, 4608, -1, -2,
                             256,  512,  1024, 2048, 4096, 8192, 16384, 32768};

}  // namespace

extern "C" {

struct FlacInfo {
  int32_t sample_rate;
  int32_t channels;
  int32_t bits_per_sample;
  int64_t total_samples;  // per channel; 0 if unknown
  uint8_t md5[16];
};

// Decodes a whole FLAC stream held in memory (e.g. a byte slice out of a
// stored zip archive — reference fairseq_code/audio_utils.py:37-38 reads
// such slices with mmap and hands the bytes to soundfile). Returns 0 on
// success. Caller frees *out with flac_free. *out holds interleaved int32
// samples (n_samples * channels).
static int decode_buffer_unguarded(const uint8_t* data, size_t size,
                                   int32_t** out, FlacInfo* info) {
  // read-only view: the decoder never mutates the stream, so no copy
  // (flac_decode_file would otherwise copy every file twice)
  const uint8_t* buf_d = data;
  const size_t buf_n = size;

  if (buf_n < 42 || memcmp(buf_d, "fLaC", 4) != 0) return -3;

  size_t pos = 4;
  bool have_streaminfo = false;
  FlacInfo si{};
  // metadata blocks
  while (pos + 4 <= buf_n) {
    uint8_t hdr = buf_d[pos];
    bool last = hdr & 0x80;
    int type = hdr & 0x7F;
    uint32_t len = (buf_d[pos + 1] << 16) | (buf_d[pos + 2] << 8) | buf_d[pos + 3];
    pos += 4;
    if (pos + len > buf_n) return -4;
    if (type == 0 && len >= 34) {
      const uint8_t* p = buf_d + pos;
      si.sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      si.channels = ((p[12] >> 1) & 0x7) + 1;
      si.bits_per_sample = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si.total_samples = (static_cast<int64_t>(p[13] & 0x0F) << 32) |
                         (static_cast<int64_t>(p[14]) << 24) |
                         (static_cast<int64_t>(p[15]) << 16) |
                         (static_cast<int64_t>(p[16]) << 8) |
                         static_cast<int64_t>(p[17]);
      memcpy(si.md5, p + 18, 16);
      have_streaminfo = true;
    }
    pos += len;
    if (last) break;
  }
  if (!have_streaminfo) return -5;

  BitReader br(buf_d, buf_n);
  br.byte_pos = pos;

  std::vector<int32_t> pcm;
  if (si.total_samples > 0 &&
      si.total_samples * si.channels < (1LL << 31)) {
    // reserve only for plausible sizes; a corrupt 2^36 STREAMINFO count
    // must not trigger a terabyte allocation up front
    pcm.reserve(static_cast<size_t>(si.total_samples * si.channels));
  }
  std::vector<std::vector<int64_t>> ch(8);

  while (br.byte_pos < br.size) {
    // frame sync
    uint32_t sync = static_cast<uint32_t>(br.read_bits(14));
    if (br.error || br.eof()) break;
    if (sync != 0x3FFE) {
      // streams with unknown STREAMINFO total_samples have no early-exit
      // condition: once at least one frame decoded, a failed sync can mean
      // trailing non-frame bytes (padding/junk), i.e. end of audio —
      // consistent with the <2-byte-tail case hitting br.eof() above.
      // Only a BOUNDED remainder is treated that way: a large tail after
      // sync loss is mid-stream corruption and must error, not silently
      // truncate (these streams typically lack an MD5 to catch it).
      if (si.total_samples == 0 && !pcm.empty()) {
        constexpr size_t kMaxTrailingJunk = 1 << 20;  // 1 MiB
        size_t consumed = br.byte_pos >= 2 ? br.byte_pos - 2 : 0;
        if (br.size - consumed <= kMaxTrailingJunk) break;
      }
      return -6;
    }
    br.read_bit();                       // reserved
    br.read_bit();                       // blocking strategy
    uint32_t bs_code = static_cast<uint32_t>(br.read_bits(4));
    uint32_t sr_code = static_cast<uint32_t>(br.read_bits(4));
    uint32_t ch_assign = static_cast<uint32_t>(br.read_bits(4));
    uint32_t ss_code = static_cast<uint32_t>(br.read_bits(3));
    br.read_bit();  // reserved
    read_utf8_number(br);

    int block_size;
    if (bs_code == 6) {
      block_size = static_cast<int>(br.read_bits(8)) + 1;
    } else if (bs_code == 7) {
      block_size = static_cast<int>(br.read_bits(16)) + 1;
    } else {
      block_size = kBlockSizes[bs_code];
      if (block_size <= 0) return -7;
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int bps = si.bits_per_sample;
    switch (ss_code) {
      case 0: break;  // from streaminfo
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -8;
    }
    br.read_bits(8);  // CRC-8

    int n_ch;
    if (ch_assign < 8) n_ch = static_cast<int>(ch_assign) + 1;
    else if (ch_assign <= 10) n_ch = 2;
    else return -9;
    if (n_ch != si.channels) return -10;

    for (int c = 0; c < n_ch; ++c) {
      int sub_bps = bps;
      // side channel carries one extra bit
      if ((ch_assign == 8 && c == 1) || (ch_assign == 9 && c == 0) ||
          (ch_assign == 10 && c == 1)) {
        sub_bps += 1;
      }
      if (!decode_subframe(br, block_size, sub_bps, ch[c])) return -11;
    }
    br.align_byte();
    br.read_bits(16);  // CRC-16
    if (br.error) return -12;

    // stereo decorrelation
    if (ch_assign == 8) {  // left/side: right = left - side
      for (int i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_assign == 9) {  // right/side: left = right + side
      for (int i = 0; i < block_size; ++i) {
        int64_t side = ch[0][i];
        ch[0][i] = ch[1][i] + side;
      }
    } else if (ch_assign == 10) {  // mid/side
      for (int i = 0; i < block_size; ++i) {
        int64_t mid = ch[0][i];
        int64_t side = ch[1][i];
        mid = (mid << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    for (int i = 0; i < block_size; ++i) {
      for (int c = 0; c < n_ch; ++c) {
        pcm.push_back(static_cast<int32_t>(ch[c][i]));
      }
    }
    if (si.total_samples > 0 &&
        pcm.size() >= static_cast<size_t>(si.total_samples) * si.channels) {
      break;
    }
  }

  if (si.total_samples > 0 &&
      pcm.size() < static_cast<size_t>(si.total_samples) * si.channels) {
    // the stream ended (EOF / sync loss treated as end) before producing
    // the STREAMINFO-declared sample count: a truncated file. Without
    // this check a partial download decodes "successfully" short — and
    // all-zero-MD5 streams would never catch it.
    return -6;
  }
  *info = si;
  int32_t* result =
      static_cast<int32_t*>(malloc(pcm.size() * sizeof(int32_t)));
  if (!result) return -13;
  memcpy(result, pcm.data(), pcm.size() * sizeof(int32_t));
  *out = result;
  info->total_samples = static_cast<int64_t>(pcm.size() / si.channels);
  return 0;
}

// exceptions (bad_alloc from corrupt sizes, length_error) must not cross
// the extern "C" ABI into ctypes — translate to an error code
static int decode_buffer_impl(const uint8_t* data, size_t size, int32_t** out,
                              FlacInfo* info) {
  try {
    return decode_buffer_unguarded(data, size, out, info);
  } catch (const std::exception&) {
    return -14;
  }
}

int flac_decode_buffer(const uint8_t* data, int64_t size, int32_t** out,
                       FlacInfo* info) {
  if (!data || size <= 0) return -1;
  return decode_buffer_impl(data, static_cast<size_t>(size), out, info);
}

// Decodes the whole file (reads it into memory, then decode_buffer_impl).
int flac_decode_file(const char* path, int32_t** out, FlacInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -2; }
  long fsize = ftell(f);
  if (fsize <= 0) { fclose(f); return -2; }  // non-seekable or empty
  if (fseek(f, 0, SEEK_SET) != 0) { fclose(f); return -2; }
  std::vector<uint8_t> buf;
  try {
    buf.resize(static_cast<size_t>(fsize));
  } catch (const std::exception&) {
    fclose(f);
    return -2;
  }
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    return -2;
  }
  fclose(f);
  return decode_buffer_impl(buf.data(), buf.size(), out, info);
}

void flac_free(int32_t* p) { free(p); }

}  // extern "C"
