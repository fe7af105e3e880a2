// Ogg Vorbis decode (+ a small encoder used by tests/export) backed by the
// SYSTEM libvorbisfile/libvorbis/libvorbisenc/libogg shared libraries,
// loaded at runtime with dlopen. No Xiph headers are vendored: the handful
// of public ABI structs used here (ov_callbacks, vorbis_info, ogg_packet,
// ogg_page) are re-declared from the documented, decades-stable libogg /
// libvorbis public ABI; every struct the libraries treat as caller-allocated
// opaque state (OggVorbis_File, vorbis_dsp_state, vorbis_block,
// ogg_stream_state, vorbis_comment) is given an oversized aligned buffer so
// no layout assumption is made about its internals.
//
// Parity target: the reference reads ogg members through soundfile
// (reference fairseq_code/audio_utils.py:40-44 accepts the OggS magic and
// datasets load via sf.read). This build decodes them natively to float32.
//
// C ABI:
//   sslc_ogg_decode(data, len, &pcm, &channels, &rate, &frames) -> 0 | <0
//       pcm: malloc'd float32, PLANAR channel-major (channels * frames)
//   sslc_ogg_encode(pcm, frames, channels, rate, quality, &out, &out_len)
//       pcm: planar channel-major float32 in [-1, 1]
//   sslc_ogg_free(ptr)
//   sslc_ogg_available() -> 1 when libvorbisfile can be dlopen'd

#include <dlfcn.h>
#include <stdint.h>
#include <string.h>

#include <cstdio>
#include <cstdlib>
#include <new>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// public-ABI declarations (libogg / libvorbis / libvorbisfile)
// ---------------------------------------------------------------------------

typedef int64_t ogg_int64_t;

struct ov_callbacks {
  size_t (*read_func)(void *ptr, size_t size, size_t nmemb, void *src);
  int (*seek_func)(void *src, ogg_int64_t offset, int whence);
  int (*close_func)(void *src);
  long (*tell_func)(void *src);
};

struct vorbis_info {  // public layout (codec.h)
  int version;
  int channels;
  long rate;
  long bitrate_upper;
  long bitrate_nominal;
  long bitrate_lower;
  long bitrate_window;
  void *codec_setup;
};

struct ogg_packet {  // public layout (ogg.h)
  unsigned char *packet;
  long bytes;
  long b_o_s;
  long e_o_s;
  ogg_int64_t granulepos;
  ogg_int64_t packetno;
};

struct ogg_page {  // public layout (ogg.h)
  unsigned char *header;
  long header_len;
  unsigned char *body;
  long body_len;
};

// Opaque caller-allocated state: generous aligned buffers (actual sizes are
// a few hundred bytes each on x86-64; 4x headroom keeps this safe).
struct alignas(16) OpaqueBuf512 { unsigned char b[512]; };
struct alignas(16) OpaqueBuf1024 { unsigned char b[1024]; };
struct alignas(16) OpaqueBuf4096 { unsigned char b[4096]; };

using OggVorbisFileBuf = OpaqueBuf4096;   // sizeof(OggVorbis_File) ~ 944
using VorbisDspBuf = OpaqueBuf1024;       // sizeof(vorbis_dsp_state) ~ 160
using VorbisBlockBuf = OpaqueBuf1024;     // sizeof(vorbis_block) ~ 192
using OggStreamBuf = OpaqueBuf1024;       // sizeof(ogg_stream_state) ~ 408
using VorbisCommentBuf = OpaqueBuf512;    // sizeof(vorbis_comment) ~ 32

// ---------------------------------------------------------------------------
// dlopen'd entry points
// ---------------------------------------------------------------------------

struct VorbisApi {
  // vorbisfile (decode)
  int (*ov_open_callbacks)(void *, void *, const char *, long, ov_callbacks);
  vorbis_info *(*ov_info)(void *, int);
  long (*ov_read_float)(void *, float ***, int, int *);
  ogg_int64_t (*ov_pcm_total)(void *, int);
  int (*ov_clear)(void *);

  // libvorbis + libvorbisenc + libogg (encode)
  void (*vorbis_info_init)(void *);
  void (*vorbis_info_clear)(void *);
  int (*vorbis_encode_init_vbr)(void *, long, long, float);
  void (*vorbis_comment_init)(void *);
  void (*vorbis_comment_clear)(void *);
  int (*vorbis_analysis_init)(void *, void *);
  int (*vorbis_block_init)(void *, void *);
  int (*vorbis_analysis_headerout)(void *, void *, ogg_packet *,
                                   ogg_packet *, ogg_packet *);
  float **(*vorbis_analysis_buffer)(void *, int);
  int (*vorbis_analysis_wrote)(void *, int);
  int (*vorbis_analysis_blockout)(void *, void *);
  int (*vorbis_analysis)(void *, ogg_packet *);
  int (*vorbis_bitrate_addblock)(void *);
  int (*vorbis_bitrate_flushpacket)(void *, ogg_packet *);
  int (*vorbis_block_clear)(void *);
  void (*vorbis_dsp_clear)(void *);
  int (*ogg_stream_init)(void *, int);
  int (*ogg_stream_packetin)(void *, ogg_packet *);
  int (*ogg_stream_flush)(void *, ogg_page *);
  int (*ogg_stream_pageout)(void *, ogg_page *);
  int (*ogg_stream_clear)(void *);

  bool decode_ok = false;
  bool encode_ok = false;
};

VorbisApi *load_api() {
  static VorbisApi api;
  static bool tried = false;
  if (tried) return &api;
  tried = true;

  void *vf = dlopen("libvorbisfile.so.3", RTLD_NOW | RTLD_GLOBAL);
  if (!vf) vf = dlopen("libvorbisfile.so", RTLD_NOW | RTLD_GLOBAL);
  if (vf) {
    api.ov_open_callbacks = reinterpret_cast<decltype(api.ov_open_callbacks)>(
        dlsym(vf, "ov_open_callbacks"));
    api.ov_info =
        reinterpret_cast<decltype(api.ov_info)>(dlsym(vf, "ov_info"));
    api.ov_read_float = reinterpret_cast<decltype(api.ov_read_float)>(
        dlsym(vf, "ov_read_float"));
    api.ov_pcm_total = reinterpret_cast<decltype(api.ov_pcm_total)>(
        dlsym(vf, "ov_pcm_total"));
    api.ov_clear =
        reinterpret_cast<decltype(api.ov_clear)>(dlsym(vf, "ov_clear"));
    api.decode_ok = api.ov_open_callbacks && api.ov_info &&
                    api.ov_read_float && api.ov_pcm_total && api.ov_clear;
  }

  void *vo = dlopen("libvorbis.so.0", RTLD_NOW | RTLD_GLOBAL);
  if (!vo) vo = dlopen("libvorbis.so", RTLD_NOW | RTLD_GLOBAL);
  void *ve = dlopen("libvorbisenc.so.2", RTLD_NOW | RTLD_GLOBAL);
  if (!ve) ve = dlopen("libvorbisenc.so", RTLD_NOW | RTLD_GLOBAL);
  void *og = dlopen("libogg.so.0", RTLD_NOW | RTLD_GLOBAL);
  if (!og) og = dlopen("libogg.so", RTLD_NOW | RTLD_GLOBAL);
  if (vo && ve && og) {
#define LOAD(lib, name) \
  api.name = reinterpret_cast<decltype(api.name)>(dlsym(lib, #name))
    LOAD(vo, vorbis_info_init);
    LOAD(vo, vorbis_info_clear);
    LOAD(ve, vorbis_encode_init_vbr);
    LOAD(vo, vorbis_comment_init);
    LOAD(vo, vorbis_comment_clear);
    LOAD(vo, vorbis_analysis_init);
    LOAD(vo, vorbis_block_init);
    LOAD(vo, vorbis_analysis_headerout);
    LOAD(vo, vorbis_analysis_buffer);
    LOAD(vo, vorbis_analysis_wrote);
    LOAD(vo, vorbis_analysis_blockout);
    LOAD(vo, vorbis_analysis);
    LOAD(vo, vorbis_bitrate_addblock);
    LOAD(vo, vorbis_bitrate_flushpacket);
    LOAD(vo, vorbis_block_clear);
    LOAD(vo, vorbis_dsp_clear);
    LOAD(og, ogg_stream_init);
    LOAD(og, ogg_stream_packetin);
    LOAD(og, ogg_stream_flush);
    LOAD(og, ogg_stream_pageout);
    LOAD(og, ogg_stream_clear);
#undef LOAD
    api.encode_ok =
        api.vorbis_info_init && api.vorbis_info_clear &&
        api.vorbis_encode_init_vbr && api.vorbis_comment_init &&
        api.vorbis_comment_clear && api.vorbis_analysis_init &&
        api.vorbis_block_init && api.vorbis_analysis_headerout &&
        api.vorbis_analysis_buffer && api.vorbis_analysis_wrote &&
        api.vorbis_analysis_blockout && api.vorbis_analysis &&
        api.vorbis_bitrate_addblock && api.vorbis_bitrate_flushpacket &&
        api.vorbis_block_clear && api.vorbis_dsp_clear &&
        api.ogg_stream_init && api.ogg_stream_packetin &&
        api.ogg_stream_flush && api.ogg_stream_pageout &&
        api.ogg_stream_clear;
  }
  return &api;
}

// ---------------------------------------------------------------------------
// memory-backed ov_callbacks
// ---------------------------------------------------------------------------

struct MemSrc {
  const uint8_t *data;
  size_t size;
  size_t pos;
};

size_t mem_read(void *ptr, size_t size, size_t nmemb, void *srcv) {
  MemSrc *src = static_cast<MemSrc *>(srcv);
  if (size == 0 || nmemb == 0) return 0;
  size_t want = size * nmemb;
  size_t avail = src->size - src->pos;
  size_t take = want < avail ? want : avail;
  take -= take % size;  // whole items only
  memcpy(ptr, src->data + src->pos, take);
  src->pos += take;
  return take / size;
}

int mem_seek(void *srcv, ogg_int64_t offset, int whence) {
  MemSrc *src = static_cast<MemSrc *>(srcv);
  ogg_int64_t base = 0;
  if (whence == SEEK_CUR) base = static_cast<ogg_int64_t>(src->pos);
  else if (whence == SEEK_END) base = static_cast<ogg_int64_t>(src->size);
  ogg_int64_t target = base + offset;
  if (target < 0 || target > static_cast<ogg_int64_t>(src->size)) return -1;
  src->pos = static_cast<size_t>(target);
  return 0;
}

long mem_tell(void *srcv) {
  return static_cast<long>(static_cast<MemSrc *>(srcv)->pos);
}

}  // namespace

extern "C" {

int sslc_ogg_available() {
  VorbisApi *api = load_api();
  return api->decode_ok ? 1 : 0;
}

int sslc_ogg_encode_available() {
  VorbisApi *api = load_api();
  return api->encode_ok ? 1 : 0;
}

void sslc_ogg_free(void *p) { free(p); }

// Returns 0 on success. Negative codes:
//  -1 libvorbisfile unavailable   -2 not a decodable vorbis stream
//  -3 decode error mid-stream     -4 allocation failure
//  -5 empty stream
int sslc_ogg_decode(const uint8_t *data, size_t len, float **out_pcm,
                    int32_t *out_channels, int32_t *out_rate,
                    int64_t *out_frames) {
  *out_pcm = nullptr;
  *out_channels = 0;
  *out_rate = 0;
  *out_frames = 0;

  VorbisApi *api = load_api();
  if (!api->decode_ok) return -1;

  MemSrc src{data, len, 0};
  ov_callbacks cb{mem_read, mem_seek, nullptr, mem_tell};
  OggVorbisFileBuf vf_buf;
  memset(&vf_buf, 0, sizeof(vf_buf));

  if (api->ov_open_callbacks(&src, &vf_buf, nullptr, 0, cb) < 0) return -2;

  vorbis_info *vi = api->ov_info(&vf_buf, -1);
  if (!vi || vi->channels <= 0 || vi->channels > 32 || vi->rate <= 0) {
    api->ov_clear(&vf_buf);
    return -2;
  }
  int channels = vi->channels;
  long rate = vi->rate;

  std::vector<std::vector<float>> ch(static_cast<size_t>(channels));
  ogg_int64_t total = api->ov_pcm_total(&vf_buf, -1);
  if (total > 0 && total < (1LL << 31)) {
    for (auto &c : ch) c.reserve(static_cast<size_t>(total));
  }

  int bitstream = 0;
  for (;;) {
    float **pcm = nullptr;
    long n = api->ov_read_float(&vf_buf, &pcm, 4096, &bitstream);
    if (n == 0) break;  // EOF
    if (n < 0) {
      // OV_HOLE (-3) = recoverable page loss: skip, like sf.read does.
      // Other codes are real decode failures.
      if (n == -3) continue;
      api->ov_clear(&vf_buf);
      return -3;
    }
    // chained streams: vorbisfile switches links mid-read and pcm[] then
    // has the NEW link's channel count — indexing with the first link's
    // would read out of bounds. A format change mid-file cannot be
    // represented in one output array: fail cleanly.
    vorbis_info *cur = api->ov_info(&vf_buf, bitstream);
    if (!cur || cur->channels != channels || cur->rate != rate) {
      api->ov_clear(&vf_buf);
      return -7;  // chained stream changed channels/rate
    }
    for (int c = 0; c < channels; ++c) {
      ch[static_cast<size_t>(c)].insert(ch[static_cast<size_t>(c)].end(),
                                        pcm[c], pcm[c] + n);
    }
  }
  api->ov_clear(&vf_buf);

  size_t frames = ch[0].size();
  if (frames == 0) return -5;
  float *out = static_cast<float *>(malloc(sizeof(float) * frames *
                                           static_cast<size_t>(channels)));
  if (!out) return -4;
  for (int c = 0; c < channels; ++c) {
    memcpy(out + static_cast<size_t>(c) * frames, ch[static_cast<size_t>(c)].data(),
           sizeof(float) * frames);
  }
  *out_pcm = out;
  *out_channels = channels;
  *out_rate = static_cast<int32_t>(rate);
  *out_frames = static_cast<int64_t>(frames);
  return 0;
}

// pcm: planar channel-major float32. Returns 0 on success; negative codes:
//  -1 encoder libs unavailable  -2 bad args  -3 encoder init failed
//  -4 allocation failure
int sslc_ogg_encode(const float *pcm, int64_t frames, int32_t channels,
                    int32_t rate, float quality, uint8_t **out,
                    size_t *out_len) {
  *out = nullptr;
  *out_len = 0;
  VorbisApi *api = load_api();
  if (!api->encode_ok) return -1;
  if (frames <= 0 || channels <= 0 || channels > 8 || rate <= 0) return -2;

  OpaqueBuf512 vi_buf;  // vorbis_info is ~64B; opaque-oversized like the rest
  VorbisCommentBuf vc_buf;
  VorbisDspBuf vd_buf;
  VorbisBlockBuf vb_buf;
  OggStreamBuf os_buf;
  memset(&vi_buf, 0, sizeof(vi_buf));
  memset(&vc_buf, 0, sizeof(vc_buf));
  memset(&vd_buf, 0, sizeof(vd_buf));
  memset(&vb_buf, 0, sizeof(vb_buf));
  memset(&os_buf, 0, sizeof(os_buf));

  api->vorbis_info_init(&vi_buf);
  if (api->vorbis_encode_init_vbr(&vi_buf, channels, rate, quality) != 0) {
    api->vorbis_info_clear(&vi_buf);
    return -3;
  }
  api->vorbis_comment_init(&vc_buf);
  api->vorbis_analysis_init(&vd_buf, &vi_buf);
  api->vorbis_block_init(&vd_buf, &vb_buf);
  api->ogg_stream_init(&os_buf, 0x53534c43);  // 'SSLC'

  std::vector<uint8_t> bytes;
  ogg_page page;
  ogg_packet op;

  auto append_page = [&]() {
    bytes.insert(bytes.end(), page.header, page.header + page.header_len);
    bytes.insert(bytes.end(), page.body, page.body + page.body_len);
  };

  {
    ogg_packet h, h_comm, h_code;
    api->vorbis_analysis_headerout(&vd_buf, &vc_buf, &h, &h_comm, &h_code);
    api->ogg_stream_packetin(&os_buf, &h);
    api->ogg_stream_packetin(&os_buf, &h_comm);
    api->ogg_stream_packetin(&os_buf, &h_code);
    while (api->ogg_stream_flush(&os_buf, &page)) append_page();
  }

  auto drain = [&]() {
    while (api->vorbis_analysis_blockout(&vd_buf, &vb_buf) == 1) {
      api->vorbis_analysis(&vb_buf, nullptr);
      api->vorbis_bitrate_addblock(&vb_buf);
      while (api->vorbis_bitrate_flushpacket(&vd_buf, &op) == 1) {
        api->ogg_stream_packetin(&os_buf, &op);
        while (api->ogg_stream_pageout(&os_buf, &page)) append_page();
      }
    }
  };

  const int kChunk = 1024;
  int64_t done = 0;
  while (done < frames) {
    int n = static_cast<int>(frames - done < kChunk ? frames - done : kChunk);
    float **buf = api->vorbis_analysis_buffer(&vd_buf, n);
    for (int c = 0; c < channels; ++c) {
      memcpy(buf[c], pcm + static_cast<size_t>(c) * frames + done,
             sizeof(float) * static_cast<size_t>(n));
    }
    api->vorbis_analysis_wrote(&vd_buf, n);
    drain();
    done += n;
  }
  api->vorbis_analysis_wrote(&vd_buf, 0);  // EOS
  drain();
  while (api->ogg_stream_flush(&os_buf, &page)) append_page();

  api->ogg_stream_clear(&os_buf);
  api->vorbis_block_clear(&vb_buf);
  api->vorbis_dsp_clear(&vd_buf);
  api->vorbis_comment_clear(&vc_buf);
  api->vorbis_info_clear(&vi_buf);

  uint8_t *mem = static_cast<uint8_t *>(malloc(bytes.size()));
  if (!mem) return -4;
  memcpy(mem, bytes.data(), bytes.size());
  *out = mem;
  *out_len = bytes.size();
  return 0;
}

}  // extern "C"
