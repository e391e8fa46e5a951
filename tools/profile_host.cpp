// Standalone profiling main for the native host engine.
//
// Build + run (gprof):
//   g++ -std=c++17 -O3 -march=native -funroll-loops -fopenmp-simd -pg \
//       tools/profile_host.cpp -o /tmp/prof_host
//   cd /tmp && ./prof_host /root/reference/testimage/03.pgm 2 1
//   gprof /tmp/prof_host /tmp/gmon.out | head -40
//
// Usage: prof_host <in.pgm> [qpd6] [reps]
#include "../csrc/hevce_host.cpp"

#include <cstdio>
#include <cstdlib>
#include <ctime>

static unsigned char* load_pgm(const char* path, int* h, int* w) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    char magic[3] = {0};
    int maxv = 0;
    if (std::fscanf(f, "%2s", magic) != 1 || magic[0] != 'P' || magic[1] != '5') {
        std::fclose(f);
        return nullptr;
    }
    // skip whitespace/comments between header fields
    int vals[3], got = 0;
    while (got < 3) {
        int ch = std::fgetc(f);
        if (ch == '#') { while ((ch = std::fgetc(f)) != '\n' && ch != EOF) {} }
        else if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') continue;
        else { std::ungetc(ch, f); if (std::fscanf(f, "%d", &vals[got]) != 1) break; got++; }
    }
    if (got != 3) { std::fclose(f); return nullptr; }
    std::fgetc(f);  // single whitespace after maxval
    *w = vals[0]; *h = vals[1]; maxv = vals[2];
    if (maxv > 255) { std::fclose(f); return nullptr; }
    auto* buf = (unsigned char*)std::malloc((size_t)*h * *w);
    if (std::fread(buf, 1, (size_t)*h * *w, f) != (size_t)*h * *w) {
        std::free(buf); std::fclose(f); return nullptr;
    }
    std::fclose(f);
    return buf;
}

int main(int argc, char** argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: %s in.pgm [qpd6] [reps]\n", argv[0]); return 1; }
    int qpd6 = argc > 2 ? std::atoi(argv[2]) : 2;
    int reps = argc > 3 ? std::atoi(argv[3]) : 1;
    int h = 0, w = 0;
    unsigned char* img = load_pgm(argv[1], &h, &w);
    if (!img) { std::fprintf(stderr, "bad pgm %s\n", argv[1]); return 1; }
    size_t cap = hevce::stream_capacity((h + 31) & ~31, (w + 31) & ~31);
    auto* stream = (unsigned char*)std::malloc(cap);
    auto* rcon = (unsigned char*)std::malloc((size_t)(h + 31) * (w + 31));
    long long n = 0;
    std::clock_t t0 = std::clock();
    for (int r = 0; r < reps; r++) {
        int y = h, x = w;
        n = hevce::encode(img, &y, &x, qpd6, stream, rcon, nullptr, cap);
    }
    double dt = (double)(std::clock() - t0) / CLOCKS_PER_SEC;
    std::printf("%dx%d qpd6=%d reps=%d: %lld B, %.3f s/img, %.4f MP/s\n",
                h, w, qpd6, reps, n, dt / reps,
                (double)h * w * reps / 1e6 / dt);
#ifdef HEVCE_VEC_STATS
    std::printf("vec stats: waves=%lld lanes=%lld (fill %.1f%%) ops=%lld steps=%lld (util %.1f%%)\n",
                (long long)hevce::g_waves.load(), (long long)hevce::g_lanes.load(),
                100.0 * hevce::g_lanes.load() / (16.0 * hevce::g_waves.load() + 1e-9),
                (long long)hevce::g_ops.load(), (long long)hevce::g_steps.load(),
                100.0 * hevce::g_ops.load() / (16.0 * hevce::g_steps.load() + 1e-9));
    std::printf("vec cycles=%.2fG gen cycles=%.2fG gen_ops=%lld scalar_trials=%lld\n",
                hevce::g_vec_cycles.load() / 1e9, hevce::g_gen_cycles.load() / 1e9,
                (long long)hevce::g_gen_ops.load(), (long long)hevce::g_scalar_trials.load());
#endif
    std::free(img); std::free(stream); std::free(rcon);
    return n > 0 ? 0 : 2;
}
