// Standalone native-tier microbenchmark: isolates raw C++ codec speed from
// Python marshalling. Build:
//   g++ -O3 -march=native -std=c++17 bench_native.cpp -o /tmp/bench_native -pthread
// Usage: bench_native <corpus-file> [block_size] [threads]

#include "tpulz4.cpp"

#include <chrono>
#include <cstdio>
#include <fstream>
#include <string>

static double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s corpus [block_size] [threads]\n", argv[0]);
    return 2;
  }
  std::ifstream f(argv[1], std::ios::binary);
  std::vector<uint8_t> data((std::istreambuf_iterator<char>(f)),
                            std::istreambuf_iterator<char>());
  int block = argc > 2 ? std::atoi(argv[2]) : 65536;
  int threads = argc > 3 ? std::atoi(argv[3]) : 1;
  // tile corpus up to ~192MB for stable timing
  size_t want = size_t(192) << 20;
  std::vector<uint8_t> corpus;
  corpus.reserve(want + data.size());
  while (corpus.size() < want) corpus.insert(corpus.end(), data.begin(), data.end());

  int n = (int)(corpus.size() / block);
  corpus.resize(size_t(n) * block);
  int cap = tpulz4_max_compressed_length(block);

  std::vector<int64_t> src_off(n), cdst_off(n), ddst_off(n);
  std::vector<int32_t> src_len(n, block), clen(n), dlen(n);
  for (int i = 0; i < n; ++i) {
    src_off[i] = (int64_t)i * block;
    cdst_off[i] = (int64_t)i * cap;
    ddst_off[i] = (int64_t)i * block;
  }
  std::vector<uint8_t> comp(size_t(n) * cap);
  std::vector<uint8_t> out(corpus.size());

  // compress (timed)
  tpulz4_compress_fast_batch(corpus.data(), src_off.data(), src_len.data(),
                             comp.data(), cdst_off.data(), cap, clen.data(), n,
                             threads);
  double tc = 1e30;
  for (int r = 0; r < 5; ++r) {
    double t0 = now_s();
    tpulz4_compress_fast_batch(corpus.data(), src_off.data(), src_len.data(),
                               comp.data(), cdst_off.data(), cap, clen.data(),
                               n, threads);
    tc = std::min(tc, now_s() - t0);
  }
  int64_t csize = 0;
  for (int i = 0; i < n; ++i) csize += clen[i];

  // decompress (timed)
  double td = 1e30;
  for (int r = 0; r < 5; ++r) {
    double t0 = now_s();
    tpulz4_decompress_safe_batch(comp.data(), cdst_off.data(), clen.data(),
                                 out.data(), ddst_off.data(), block,
                                 dlen.data(), n, threads);
    td = std::min(td, now_s() - t0);
  }
  if (std::memcmp(out.data(), corpus.data(), corpus.size()) != 0) {
    std::fprintf(stderr, "ROUNDTRIP MISMATCH\n");
    return 1;
  }
  double gb = corpus.size() / 1e9;
  std::printf(
      "{\"bytes\": %zu, \"block\": %d, \"threads\": %d, "
      "\"compress_gbps\": %.3f, \"decompress_gbps\": %.3f, \"ratio\": %.4f}\n",
      corpus.size(), block, threads, gb / tc, gb / td,
      (double)csize / corpus.size());
  return 0;
}
