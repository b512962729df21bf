// Standalone gprof harness for the native runtime's encode path.
//
//   g++ -O2 -march=native -pg -pthread -o /tmp/native_prof \
//       tools/native_prof.cpp
//   /tmp/native_prof CORPUS_FILE [level] [reps] [frame_kib]
//   gprof /tmp/native_prof gmon.out | head -40
//
// Includes the library TU directly so the profile attributes samples to
// the real static functions.
#include "../zeekstd_tpu/native/zeekstd_native.cpp"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <dlfcn.h>
#include <vector>

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s corpus [level] [reps] [frame_kib]\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<u8> data(n);
  if (fread(data.data(), 1, n, f) != (size_t)n) return 2;
  fclose(f);
  int level = argc > 2 ? atoi(argv[2]) : 1;
  int reps = argc > 3 ? atoi(argv[3]) : 5;
  size_t frame = (argc > 4 ? atol(argv[4]) : 512) << 10;

  std::vector<u8> dst(n + n / 2 + (1 << 20));
  std::vector<u32> csizes(n / frame + 2);
  zn_set_mt_level(level);

  // Interleave libzstd (dlopen'd) so the host-load comparison is fair.
  typedef size_t (*zc_fn)(void*, size_t, const void*, size_t, int);
  zc_fn zstd_compress_fn = nullptr;
  void* h = dlopen("libzstd.so.1", RTLD_NOW);
  if (h) zstd_compress_fn = (zc_fn)dlsym(h, "ZSTD_compress");

  double best = 0, best_z = 0;
  size_t zc = 0;
  for (int r = 0; r < reps; r++) {
    auto t0 = std::chrono::steady_clock::now();
    i64 c = zn_compress_stream_mt(data.data(), n, dst.data(), dst.size(),
                                  frame, 0, 1, csizes.data());
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    if (c < 0) return 3;
    double mibs = n / dt / (1 << 20);
    if (mibs > best) best = mibs;
    double zmibs = 0;
    if (zstd_compress_fn) {
      t0 = std::chrono::steady_clock::now();
      zc = zstd_compress_fn(dst.data(), dst.size(), data.data(), n, level);
      dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
               .count();
      zmibs = n / dt / (1 << 20);
      if (zmibs > best_z) best_z = zmibs;
    }
    fprintf(stderr, "enc L%d: %lld bytes (%.2f%%) %.1f MiB/s | zstd %.1f\n",
            level, (long long)c, 100.0 * c / n, mibs, zmibs);
  }
  fprintf(stderr, "best: %.1f MiB/s | zstd best %.1f (%.2f%%) -> %.2fx\n",
          best, best_z, 100.0 * zc / n, best_z ? best / best_z : 0.0);
#ifdef ZN_ENCPROF
  unsigned long long c[8];
  zn_encprof_get(c);
  double tot = (double)(c[0] + c[1] + c[2]);
  fprintf(stderr,
          "encprof (%d reps): parse %.0f%% lits %.0f%% seqs %.0f%% | "
          "%.2f seqs/KiB, %.1f%% literal bytes\n",
          reps, 100 * c[0] / tot, 100 * c[1] / tot, 100 * c[2] / tot,
          c[3] / ((double)n * reps / 1024), 100.0 * c[4] / ((double)n * reps));
  fprintf(stderr, "  probes %.2fM inserts %.2fM per rep\n", c[5] / 1e6 / reps, c[6] / 1e6 / reps);
#endif
  return 0;
}
