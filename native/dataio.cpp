// Native data-IO runtime for dc_tts_tpu.
//
// The reference delegates its input pipeline to TensorFlow's C++ queue
// runners (reference data_load.py:99-129: slice_input_producer + 8-thread
// bucket queues). This library is the first-party equivalent: a C++
// thread-pool prefetcher that reads .npy feature files and RIFF/WAVE audio,
// assembles statically-shaped padded batches, and hands them to Python
// through a bounded ring of pinned host buffers (ctypes boundary, no numpy
// dependency here).
//
// Exposed C ABI:
//   dcio_wav_read / dcio_wav_free        — decode PCM wav -> float32 mono
//   dcio_loader_create / _destroy        — build a batch prefetcher
//   dcio_loader_next                     — block for the next batch
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decoding

struct DcioWav {
  float* data;
  int64_t n;
  int32_t sr;
};

// Reads a RIFF/WAVE file; supports PCM 8/16/24/32-bit and float32, any
// channel count (averaged to mono). Returns nullptr on failure.
DcioWav* dcio_wav_read(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto fail = [&]() {
    fclose(f);
    return nullptr;
  };
  char tag[5] = {0};
  uint32_t riff_size = 0;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4)) return fail();
  if (fread(&riff_size, 4, 1, f) != 1) return fail();
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "WAVE", 4)) return fail();

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  bool have_fmt = false;
  std::vector<uint8_t> payload;

  while (fread(tag, 1, 4, f) == 4) {
    uint32_t sz = 0;
    if (fread(&sz, 4, 1, f) != 1) break;
    if (!memcmp(tag, "fmt ", 4)) {
      std::vector<uint8_t> buf(sz);
      if (fread(buf.data(), 1, sz, f) != sz) return fail();
      fmt = *(uint16_t*)&buf[0];
      channels = *(uint16_t*)&buf[2];
      sr = *(uint32_t*)&buf[4];
      bits = *(uint16_t*)&buf[14];
      have_fmt = true;
    } else if (!memcmp(tag, "data", 4)) {
      payload.resize(sz);
      if (fread(payload.data(), 1, sz, f) != sz) return fail();
    } else {
      fseek(f, (long)(sz + (sz & 1)), SEEK_CUR);
      continue;
    }
    if (sz & 1) fseek(f, 1, SEEK_CUR);
  }
  fclose(f);
  if (!have_fmt || payload.empty() || channels == 0) return nullptr;

  const bool is_float = (fmt == 3);
  if (!is_float && fmt != 1) return nullptr;  // PCM or IEEE float only
  const int bytes = bits / 8;
  if (bytes < 1 || bytes > 4) return nullptr;
  const int64_t frames = (int64_t)payload.size() / (bytes * channels);

  auto* out = new DcioWav{new float[frames], frames, (int32_t)sr};
  const uint8_t* p = payload.data();
  for (int64_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = p + (i * channels + c) * bytes;
      double v = 0.0;
      if (is_float && bytes == 4) {
        v = *(const float*)s;
      } else if (bytes == 1) {
        v = ((double)*s - 128.0) / 128.0;
      } else if (bytes == 2) {
        v = (double)*(const int16_t*)s / 32768.0;
      } else if (bytes == 3) {
        int32_t x = (s[0] | (s[1] << 8) | (s[2] << 16));
        if (x & 0x800000) x |= ~0xFFFFFF;  // sign extend
        v = (double)x / 8388608.0;
      } else {  // 32-bit PCM
        v = (double)*(const int32_t*)s / 2147483648.0;
      }
      acc += v;
    }
    out->data[i] = (float)(acc / channels);
  }
  return out;
}

float* dcio_wav_data(DcioWav* w) { return w->data; }
int64_t dcio_wav_len(DcioWav* w) { return w->n; }
int32_t dcio_wav_sr(DcioWav* w) { return w->sr; }

void dcio_wav_free(DcioWav* w) {
  if (!w) return;
  delete[] w->data;
  delete w;
}

// ---------------------------------------------------------------------------
// .npy reading (v1/v2, C-order, little-endian f4/i4 only — what our prepro
// writes)

static bool npy_read(const std::string& path, std::vector<float>& out,
                     int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6)) {
    fclose(f);
    return false;
  }
  uint32_t hlen = 0;
  if (magic[6] == 1) {
    uint16_t h16 = 0;
    if (fread(&h16, 2, 1, f) != 1) { fclose(f); return false; }
    hlen = h16;
  } else {
    if (fread(&hlen, 4, 1, f) != 1) { fclose(f); return false; }
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) { fclose(f); return false; }
  if (header.find("'descr': '<f4'") == std::string::npos &&
      header.find("'descr': '|f4'") == std::string::npos) {
    fclose(f);
    return false;
  }
  auto sp = header.find("'shape': (");
  if (sp == std::string::npos) { fclose(f); return false; }
  int64_t r = 0, c = 1;
  if (sscanf(header.c_str() + sp, "'shape': (%ld, %ld", &r, &c) < 1) {
    fclose(f);
    return false;
  }
  out.resize((size_t)(r * c));
  size_t got = fread(out.data(), 4, out.size(), f);
  fclose(f);
  if (got != out.size()) return false;
  *rows = r;
  *cols = c;
  return true;
}

// ---------------------------------------------------------------------------
// batch prefetch loader

struct Batch {
  std::vector<int32_t> texts;      // B * max_n
  std::vector<float> mels;         // B * max_t * n_mels
  std::vector<float> mags;         // B * max_t * r * n_freq
  std::vector<int32_t> text_lens;  // B
  std::vector<int32_t> mel_lens;   // B
};

struct Loader {
  // config
  int32_t batch, max_n, max_t, n_mels, n_freq, r;
  // dataset: per-example text ids + feature paths
  std::vector<std::vector<int32_t>> texts;
  std::vector<std::string> mel_paths, mag_paths;
  // machinery
  std::mt19937 rng;
  std::vector<int32_t> order;
  size_t cursor = 0;
  std::mutex idx_mu;
  std::queue<Batch*> ready;
  std::mutex q_mu;
  std::condition_variable q_cv, space_cv;
  size_t q_cap;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void next_indices(std::vector<int32_t>& idx) {
    std::lock_guard<std::mutex> lk(idx_mu);
    idx.clear();
    for (int i = 0; i < batch; ++i) {
      if (cursor >= order.size()) {
        std::shuffle(order.begin(), order.end(), rng);
        cursor = 0;
      }
      idx.push_back(order[cursor++]);
    }
  }

  void work() {
    std::vector<int32_t> idx;
    std::vector<float> mel, mag;
    while (!stop.load()) {
      next_indices(idx);
      auto* b = new Batch;
      b->texts.assign((size_t)batch * max_n, 0);
      b->mels.assign((size_t)batch * max_t * n_mels, 0.f);
      b->mags.assign((size_t)batch * max_t * r * n_freq, 0.f);
      b->text_lens.assign(batch, 0);
      b->mel_lens.assign(batch, 0);
      bool ok = true;
      for (int i = 0; i < batch && ok; ++i) {
        const auto& ids = texts[idx[i]];
        int32_t tn = (int32_t)std::min<size_t>(ids.size(), max_n);
        memcpy(&b->texts[(size_t)i * max_n], ids.data(), tn * 4);
        b->text_lens[i] = tn;
        int64_t mr, mc, gr, gc;
        ok = npy_read(mel_paths[idx[i]], mel, &mr, &mc) &&
             npy_read(mag_paths[idx[i]], mag, &gr, &gc);
        if (!ok) break;
        int32_t t = (int32_t)std::min<int64_t>(mr, max_t);
        b->mel_lens[i] = t;
        for (int32_t tt = 0; tt < t; ++tt)
          memcpy(&b->mels[((size_t)i * max_t + tt) * n_mels],
                 &mel[(size_t)tt * mc], n_mels * 4);
        int32_t tg = (int32_t)std::min<int64_t>(gr, (int64_t)max_t * r);
        for (int32_t tt = 0; tt < tg; ++tt)
          memcpy(&b->mags[((size_t)i * max_t * r + tt) * n_freq],
                 &mag[(size_t)tt * gc], n_freq * 4);
      }
      if (!ok) {
        delete b;
        continue;  // skip unreadable batch
      }
      std::unique_lock<std::mutex> lk(q_mu);
      space_cv.wait(lk, [&] { return ready.size() < q_cap || stop.load(); });
      if (stop.load()) {
        delete b;
        return;
      }
      ready.push(b);
      q_cv.notify_one();
    }
  }
};

// texts: flattened int32 ids; text_offsets: (n_examples+1) prefix offsets.
// paths: '\n'-joined mel paths and mag paths.
Loader* dcio_loader_create(int32_t n_examples, const int32_t* texts,
                           const int64_t* text_offsets, const char* mel_paths,
                           const char* mag_paths, int32_t batch,
                           int32_t max_n, int32_t max_t, int32_t n_mels,
                           int32_t n_freq, int32_t r, int32_t n_threads,
                           int32_t queue_cap, uint64_t seed) {
  auto* L = new Loader;
  L->batch = batch;
  L->max_n = max_n;
  L->max_t = max_t;
  L->n_mels = n_mels;
  L->n_freq = n_freq;
  L->r = r;
  L->q_cap = (size_t)queue_cap;
  L->rng.seed(seed);
  L->texts.resize(n_examples);
  for (int i = 0; i < n_examples; ++i)
    L->texts[i].assign(texts + text_offsets[i], texts + text_offsets[i + 1]);
  auto split = [](const char* s, std::vector<std::string>& out) {
    const char* p = s;
    while (*p) {
      const char* e = strchr(p, '\n');
      if (!e) e = p + strlen(p);
      out.emplace_back(p, e - p);
      p = (*e) ? e + 1 : e;
    }
  };
  split(mel_paths, L->mel_paths);
  split(mag_paths, L->mag_paths);
  if ((int32_t)L->mel_paths.size() != n_examples ||
      (int32_t)L->mag_paths.size() != n_examples) {
    delete L;
    return nullptr;
  }
  L->order.resize(n_examples);
  for (int i = 0; i < n_examples; ++i) L->order[i] = i;
  std::shuffle(L->order.begin(), L->order.end(), L->rng);
  for (int i = 0; i < n_threads; ++i)
    L->workers.emplace_back([L] { L->work(); });
  return L;
}

// Copies the next batch into caller buffers. Returns 0 on success.
int32_t dcio_loader_next(Loader* L, int32_t* texts, float* mels, float* mags,
                         int32_t* text_lens, int32_t* mel_lens) {
  Batch* b = nullptr;
  {
    std::unique_lock<std::mutex> lk(L->q_mu);
    L->q_cv.wait(lk, [&] { return !L->ready.empty() || L->stop.load(); });
    if (L->stop.load()) return 1;
    b = L->ready.front();
    L->ready.pop();
    L->space_cv.notify_one();
  }
  memcpy(texts, b->texts.data(), b->texts.size() * 4);
  memcpy(mels, b->mels.data(), b->mels.size() * 4);
  memcpy(mags, b->mags.data(), b->mags.size() * 4);
  memcpy(text_lens, b->text_lens.data(), b->text_lens.size() * 4);
  memcpy(mel_lens, b->mel_lens.data(), b->mel_lens.size() * 4);
  delete b;
  return 0;
}

void dcio_loader_destroy(Loader* L) {
  if (!L) return;
  L->stop.store(true);
  L->q_cv.notify_all();
  L->space_cv.notify_all();
  for (auto& t : L->workers) t.join();
  while (!L->ready.empty()) {
    delete L->ready.front();
    L->ready.pop();
  }
  delete L;
}

}  // extern "C"
