// Fast RIFF/WAVE decoder for the training data loader.
//
// The reference's data pipeline decodes wavs with torchaudio's C++ backend in
// 8 dataloader worker processes (train_apadapter_v2.py:253-256, train.sh);
// this is the equivalent native component for ap_adapter_tpu: a minimal,
// allocation-free PCM/float WAV reader exposed via a C ABI and loaded with
// ctypes (ap_adapter_tpu/audio/io.py). Supports PCM 8/16/24/32-bit and
// IEEE float32/64, mono or multichannel, with sane handling of extra chunks.
//
// Build: make -C native   (produces libwavio.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Reader {
  FILE* f = nullptr;
  ~Reader() {
    if (f) fclose(f);
  }
  bool read(void* dst, size_t n) { return fread(dst, 1, n, f) == n; }
  bool skip(long n) { return fseek(f, n, SEEK_CUR) == 0; }
};

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = 0;
  uint32_t data_bytes = 0;
};

bool parse_header(Reader& r, WavInfo* info) {
  char tag[4];
  uint32_t riff_size;
  if (!r.read(tag, 4) || memcmp(tag, "RIFF", 4) != 0) return false;
  if (!r.read(&riff_size, 4)) return false;
  if (!r.read(tag, 4) || memcmp(tag, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (r.read(tag, 4)) {
    uint32_t size;
    if (!r.read(&size, 4)) return false;
    if (memcmp(tag, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t take = size < sizeof(buf) ? size : sizeof(buf);
      if (!r.read(buf, take)) return false;
      if (size > take && !r.skip(size - take)) return false;
      memcpy(&info->format, buf + 0, 2);
      memcpy(&info->channels, buf + 2, 2);
      memcpy(&info->sample_rate, buf + 4, 4);
      memcpy(&info->bits, buf + 14, 2);
      if (info->format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        uint16_t sub;
        memcpy(&sub, buf + 24, 2);
        info->format = sub;
      }
      have_fmt = true;
    } else if (memcmp(tag, "data", 4) == 0) {
      info->data_offset = ftell(r.f);
      info->data_bytes = size;
      return have_fmt;
    } else {
      if (!r.skip(size + (size & 1))) return false;  // chunks are 2-aligned
    }
  }
  return false;
}

// Converts one sample at `b` to float in [-1, 1]; returns NaN-free 0 on
// unsupported layouts (callers pre-validate format/bits).
inline float sample_to_f32(const uint8_t* b, uint16_t format, uint16_t bits) {
  if (format == 3 && bits == 32) {
    float v;
    memcpy(&v, b, 4);
    return v;
  }
  if (format == 3 && bits == 64) {
    double d;
    memcpy(&d, b, 8);
    return static_cast<float>(d);
  }
  switch (bits) {
    case 16: {
      int16_t v;
      memcpy(&v, b, 2);
      return static_cast<float>(v) / 32768.0f;
    }
    case 32: {
      int32_t v;
      memcpy(&v, b, 4);
      return static_cast<float>(v) / 2147483648.0f;
    }
    case 24: {
      int32_t v = (b[0] << 8) | (b[1] << 16) | (b[2] << 24);
      return static_cast<float>(v >> 8) / 8388608.0f;
    }
    case 8:
      return (static_cast<float>(*b) - 128.0f) / 128.0f;
    default:
      return 0.0f;
  }
}

// Streams one file as mono (channel mean) into dst[0..capacity), zero-padding
// the tail. Writes the decoded (pre-pad) frame count and the file's sample
// rate. Returns 0 on success, <0 on error (dst is zero-filled on error).
int32_t read_mono_into(const char* path, float* dst, int64_t capacity,
                       int64_t* frames_out, int32_t* sr_out) {
  std::fill(dst, dst + capacity, 0.0f);
  *frames_out = 0;
  *sr_out = 0;
  Reader r;
  r.f = fopen(path, "rb");
  if (!r.f) return -1;
  WavInfo info;
  if (!parse_header(r, &info) || info.channels == 0 || info.bits == 0)
    return -2;
  if (info.format != 1 && info.format != 3) return -3;
  const uint32_t bps = info.bits / 8;
  const size_t frame_bytes = static_cast<size_t>(bps) * info.channels;
  if (frame_bytes == 0) return -2;
  const int64_t frames = static_cast<int64_t>(info.data_bytes / frame_bytes);
  const int64_t nf = std::min(frames, capacity);
  if (fseek(r.f, info.data_offset, SEEK_SET) != 0) return -4;

  constexpr size_t kChunk = 1 << 16;
  uint8_t buf[kChunk];
  const int64_t frames_per_chunk =
      static_cast<int64_t>(kChunk / frame_bytes);
  const float ch_scale = 1.0f / static_cast<float>(info.channels);
  int64_t done = 0;
  while (done < nf) {
    const int64_t want = std::min(nf - done, frames_per_chunk);
    const size_t got =
        fread(buf, 1, static_cast<size_t>(want) * frame_bytes, r.f);
    const int64_t fw = static_cast<int64_t>(got / frame_bytes);
    if (fw == 0) break;
    const uint8_t* p = buf;
    if (info.channels == 1 && info.bits == 16 && info.format == 1) {
      for (int64_t i = 0; i < fw; ++i) {  // dominant case: mono PCM16
        int16_t v;
        memcpy(&v, p + i * 2, 2);
        dst[done + i] = static_cast<float>(v) / 32768.0f;
      }
    } else if (info.channels == 1 && info.bits == 32 && info.format == 3) {
      memcpy(dst + done, p, static_cast<size_t>(fw) * 4);
    } else {
      for (int64_t i = 0; i < fw; ++i) {
        float acc = 0.0f;
        for (uint32_t c = 0; c < info.channels; ++c)
          acc += sample_to_f32(p + c * bps, info.format, info.bits);
        dst[done + i] = acc * ch_scale;
        p += frame_bytes;
      }
    }
    done += fw;
  }
  *frames_out = done;
  *sr_out = static_cast<int32_t>(info.sample_rate);
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success; fills frames / channels / sample_rate.
int32_t wavio_read_info(const char* path, int64_t* frames, int32_t* channels,
                        int32_t* sample_rate) {
  Reader r;
  r.f = fopen(path, "rb");
  if (!r.f) return -1;
  WavInfo info;
  if (!parse_header(r, &info) || info.channels == 0 || info.bits == 0) return -2;
  if (info.format != 1 && info.format != 3) return -3;
  const uint32_t bytes_per_frame = info.channels * (info.bits / 8);
  if (bytes_per_frame == 0) return -2;
  *frames = static_cast<int64_t>(info.data_bytes / bytes_per_frame);
  *channels = info.channels;
  *sample_rate = static_cast<int32_t>(info.sample_rate);
  return 0;
}

// Decodes interleaved float32 samples in [-1, 1] into `out` (capacity
// `out_len` floats). Returns the number of floats written, or <0 on error.
int64_t wavio_read_f32(const char* path, float* out, int64_t out_len) {
  Reader r;
  r.f = fopen(path, "rb");
  if (!r.f) return -1;
  WavInfo info;
  if (!parse_header(r, &info)) return -2;
  if (info.format != 1 && info.format != 3) return -3;

  const uint32_t bps = info.bits / 8;
  const int64_t n_samples = static_cast<int64_t>(info.data_bytes / bps);
  const int64_t n = n_samples < out_len ? n_samples : out_len;
  if (fseek(r.f, info.data_offset, SEEK_SET) != 0) return -4;

  constexpr size_t kChunk = 1 << 16;
  uint8_t buf[kChunk];
  int64_t written = 0;
  while (written < n) {
    const int64_t want = (n - written) * bps < static_cast<int64_t>(kChunk)
                             ? (n - written) * bps
                             : static_cast<int64_t>(kChunk);
    const size_t got = fread(buf, 1, static_cast<size_t>(want), r.f);
    if (got == 0) break;
    const int64_t samples = static_cast<int64_t>(got / bps);
    const uint8_t* p = buf;
    if (info.format == 3 && info.bits == 32) {
      memcpy(out + written, p, samples * 4);
    } else if (info.format == 3 && info.bits == 64) {
      for (int64_t i = 0; i < samples; ++i) {
        double d;
        memcpy(&d, p + i * 8, 8);
        out[written + i] = static_cast<float>(d);
      }
    } else if (info.bits == 16) {
      for (int64_t i = 0; i < samples; ++i) {
        int16_t v;
        memcpy(&v, p + i * 2, 2);
        out[written + i] = static_cast<float>(v) / 32768.0f;
      }
    } else if (info.bits == 32) {
      for (int64_t i = 0; i < samples; ++i) {
        int32_t v;
        memcpy(&v, p + i * 4, 4);
        out[written + i] = static_cast<float>(v) / 2147483648.0f;
      }
    } else if (info.bits == 24) {
      for (int64_t i = 0; i < samples; ++i) {
        const uint8_t* b = p + i * 3;
        int32_t v = (b[0] << 8) | (b[1] << 16) | (b[2] << 24);
        out[written + i] = static_cast<float>(v >> 8) / 8388608.0f;
      }
    } else if (info.bits == 8) {
      for (int64_t i = 0; i < samples; ++i) {
        out[written + i] = (static_cast<float>(p[i]) - 128.0f) / 128.0f;
      }
    } else {
      return -3;
    }
    written += samples;
  }
  return written;
}

// Decodes `n` wav files into a [n, capacity] float32 matrix using a worker
// thread pool: each row is mono (channel mean), zero-padded past the file's
// end. `frames[i]` gets the decoded (pre-pad) frame count, `sample_rates[i]`
// the file's rate, `status[i]` 0 on success / <0 per read_mono_into.
// Resampling stays upstream (the polyphase path is the numerical contract).
// This is the native analogue of the reference's torchaudio decode in
// `--dataloader_num_workers` worker processes (train_apadapter_v2.py:253-256):
// threads instead of processes, since decode releases no Python state here.
int32_t wavio_read_batch_f32(const char* const* paths, int32_t n, float* out,
                             int64_t capacity, int64_t* frames,
                             int32_t* sample_rates, int32_t* status,
                             int32_t n_threads) {
  if (n <= 0) return 0;
  int32_t workers = n_threads > 0 ? n_threads : 4;
  workers = std::min(workers, n);
  std::atomic<int32_t> next{0};
  auto work = [&]() {
    for (;;) {
      const int32_t i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = read_mono_into(paths[i], out + static_cast<int64_t>(i) * capacity,
                                 capacity, &frames[i], &sample_rates[i]);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(workers - 1);
  for (int32_t t = 1; t < workers; ++t) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
