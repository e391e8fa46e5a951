// hevce_host — native host engine for the TPU-native HEVC intra encoder.
//
// Owns everything sequential: CABAC arithmetic coder + context models, HEVC
// syntax serialization, and the RD arbiter that walks the CU quadtree with
// speculative trial encodes. Behavioral contract matches the reference
// encoder (reference src/HEVCe.c:621-1340 entropy layer, :1346-1560 search,
// :1566-1647 top loop) and this repo's validated Python implementation
// (hevce_tpu/bitstream/*, hevce_tpu/models/encoder.py).
//
// Engineering differences from the reference (outputs stay bit-identical):
//  * trial encodes append to a shared byte arena and roll back by truncation
//    instead of copying a multi-KB coder struct per trial;
//  * candidates whose saturated distortion-only cost already exceeds the
//    incumbent best are pruned before their trial encode (cost >= w_dist*SSE
//    and ties commit the later candidate, so such candidates provably lose);
//  * next-state tables and scan orders are generated at startup, not embedded.
//
// Build: tools/build_native.py -> hevce_tpu/runtime/libhevce_host.so
#include <algorithm>
#include <atomic>
#include <cassert>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

#if defined(__AVX512F__) && defined(__AVX512BW__) && !defined(HEVCE_DISABLE_VEC)
#define HEVCE_VEC_TRIALS 1
#include <immintrin.h>
#endif

namespace hevce {

using u8 = uint8_t;
using u32 = uint32_t;
using i32 = int32_t;
using i64 = int64_t;

static constexpr i32 I32_MAX = 0x7fffffff;
static constexpr i32 CTU = 32;
static constexpr i32 MIN_CU = 8;
static constexpr i32 MODES = 35;
static constexpr i32 NUM_CTX = 142;

static inline i32 iclip(i32 v, i32 lo, i32 hi) { return v < lo ? lo : (v > hi ? hi : v); }
static inline u8 pixclip(i32 v) { return (u8)iclip(v, 0, 255); }
static inline i32 coefclip(i32 v) { return iclip(v, -32768, 32767); }

// ---------------------------------------------------------------------------
// CABAC state machine tables (standard H.265 data; next-state generated)
// ---------------------------------------------------------------------------

static const u8 kTransLps[64] = {
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63};

static const u8 kLpsTable[64][4] = {
    {128, 176, 208, 240}, {128, 167, 197, 227}, {128, 158, 187, 216}, {123, 150, 178, 205},
    {116, 142, 169, 195}, {111, 135, 160, 185}, {105, 128, 152, 175}, {100, 122, 144, 166},
    {95, 116, 137, 158}, {90, 110, 130, 150}, {85, 104, 123, 142}, {81, 99, 117, 135},
    {77, 94, 111, 128}, {73, 89, 105, 122}, {69, 85, 100, 116}, {66, 80, 95, 110},
    {62, 76, 90, 104}, {59, 72, 86, 99}, {56, 69, 81, 94}, {53, 65, 77, 89},
    {51, 62, 73, 85}, {48, 59, 69, 80}, {46, 56, 66, 76}, {43, 53, 63, 72},
    {41, 50, 59, 69}, {39, 48, 56, 65}, {37, 45, 54, 62}, {35, 43, 51, 59},
    {33, 41, 48, 56}, {32, 39, 46, 53}, {30, 37, 43, 50}, {29, 35, 41, 48},
    {27, 33, 39, 45}, {26, 31, 37, 43}, {24, 30, 35, 41}, {23, 28, 33, 39},
    {22, 27, 32, 37}, {21, 26, 30, 35}, {20, 24, 29, 33}, {19, 23, 27, 31},
    {18, 22, 26, 30}, {17, 21, 25, 28}, {16, 20, 23, 27}, {15, 19, 22, 25},
    {14, 18, 21, 24}, {14, 17, 20, 23}, {13, 16, 19, 22}, {12, 15, 18, 21},
    {12, 14, 17, 20}, {11, 14, 16, 19}, {11, 13, 15, 18}, {10, 12, 15, 17},
    {10, 12, 14, 16}, {9, 11, 13, 15}, {9, 11, 12, 14}, {8, 10, 12, 14},
    {8, 9, 11, 13}, {7, 9, 11, 12}, {7, 9, 10, 12}, {7, 8, 10, 11},
    {6, 8, 9, 11}, {6, 7, 9, 10}, {6, 7, 8, 9}, {2, 2, 2, 2}};

struct Tables {
    u8 next_mps[128];
    u8 next_lps[128];
    u8 renorm[32];
    Tables() {
        for (int v = 0; v < 128; v++) {
            int s = v >> 1, m = v & 1;
            next_mps[v] = (s == 63) ? v : 2 * (s + 1 > 62 ? 62 : s + 1) + m;
            next_lps[v] = (s == 0) ? (1 - m) : 2 * kTransLps[s] + m;
        }
        next_mps[126] = 126; next_mps[127] = 127;
        next_lps[126] = 126; next_lps[127] = 127;
        renorm[0] = 6;
        for (int i = 1; i < 32; i++) {
            int b = 0;
            while ((1 << (b + 1)) <= i) b++;
            renorm[i] = 5 - b;
        }
    }
};
static const Tables T;

// context-vector layout (flat offsets; same grouping as the Python engine)
enum : int {
    CTX_SPLIT_CU = 0, CTX_PARTSIZE = 3, CTX_Y_PMODE = 4, CTX_UV_PMODE = 5,
    CTX_SPLIT_TU = 6, CTX_Y_QT_CBF = 9, CTX_UV_QT_CBF = 11, CTX_LAST_X = 16,
    CTX_LAST_Y = 41, CTX_SIG_MAP = 66, CTX_SIG_SC = 68, CTX_ONE_SC = 112,
    CTX_ABS_SC = 136,
};

static const u8 kCtxInit[NUM_CTX] = {
    139, 141, 157, 184, 184, 63, 153, 138, 138, 111, 141,
    94, 138, 182, 154, 154,
    // last_x rows (5x5, zero-padded rows)
    110, 110, 124, 0, 0, 125, 140, 153, 0, 0, 125, 127, 140, 109, 0,
    111, 143, 127, 111, 79, 108, 123, 63, 154, 0,
    // last_y
    110, 110, 124, 0, 0, 125, 140, 153, 0, 0, 125, 127, 140, 109, 0,
    111, 143, 127, 111, 79, 108, 123, 63, 154, 0,
    // sig_map
    91, 171,
    // sig_sc[44]
    111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141, 179, 153,
    125, 107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125, 141,
    140, 139, 182, 182, 152, 136, 152, 136, 153, 136, 139, 111, 136, 139,
    111, 111,
    // one_sc[24]
    140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92, 139, 107,
    122, 152, 140, 179, 166, 182, 140, 227, 122, 197,
    // abs_sc[6]
    138, 153, 136, 167, 152, 152};

struct CtxSet {
    u8 v[NUM_CTX];
    void init(i32 qpd6) {
        i32 qp = qpd6 * 6 + 4;
        for (int i = 0; i < NUM_CTX; i++) {
            i32 iv = kCtxInit[i];
            i32 st = ((((iv >> 4) * 5 - 45) * qp) >> 4) + ((iv & 15) << 3) - 16;
            st = iclip(st, 1, 126);
            v[i] = (st >= 64) ? (u8)(((st - 64) << 1) | 1) : (u8)((63 - st) << 1);
        }
    }
};

// ---------------------------------------------------------------------------
// arithmetic coder: POD state over a shared append-only byte arena
// ---------------------------------------------------------------------------

struct CabacEnc {
    i32 range = 510;
    i32 low = 0;
    i32 nbits = 23;
    i32 outstanding = 0;
    i32 bufbyte = 0xFF;
    i32 zrun = 0;
    i64 nbytes = 0;                 // total bytes logically emitted (for bit_len)
    i64 abort_len = INT64_MAX;      // trial encodes may stop once bit_len()
                                    // exceeds this (the candidate provably
                                    // loses: bits only grow, cost is monotone)
    i64 nctx = 0;                   // context-coded bins seen (rate-model
    i64 nbyp = 0;                   // feedback: realized avg ctx-bin cost =
                                    // (bit_len - nbyp) / nctx; one add per
                                    // bin — measured noise on the trial path)
    std::vector<u8>* arena = nullptr;

    // arena == nullptr makes the sink count-only: trial encodes need exact
    // rates + context evolution but never their bytes (winners are replayed)
    void emit(i32 byte) {
        byte &= 0xFF;
        if (zrun >= 2 && byte <= 0x03) {
            if (arena) arena->push_back(0x03);
            nbytes++;
            zrun = 0;
        }
        if (arena) arena->push_back((u8)byte);
        nbytes++;
        zrun = (byte == 0) ? zrun + 1 : 0;
    }

    void refill() {
        if (nbits >= 12) return;
        i32 lead = (i32)((uint32_t)low >> (24 - nbits));
        nbits += 8;
        low &= (i32)(0xFFFFFFFFu >> nbits);
        if (lead == 0xFF) {
            outstanding++;
        } else if (outstanding > 0) {
            i32 carry = lead >> 8;
            emit(bufbyte + carry);
            bufbyte = lead & 0xFF;
            i32 fill = (0xFF + carry) & 0xFF;
            for (i32 k = 0; k < outstanding - 1; k++) emit(fill);
            outstanding = 1;
        } else {
            outstanding = 1;
            bufbyte = lead;
        }
    }

    // ctx-index form shared with the trial-op recorder (see OpRecorder)
    __attribute__((always_inline)) inline void bin(CtxSet& c, i32 idx, i32 b) {
        bin(&c.v[idx], b);
    }

    __attribute__((always_inline)) inline void bin(u8* ctx, i32 b) {
        // branchless LPS/MPS select: the bin value is ~50/50 in trial
        // encodes, so the data-dependent branch mispredicts heavily
        nctx++;
        u8 v = *ctx;
        i32 lps = kLpsTable[v >> 1][(range >> 6) & 3];
        i32 r1 = range - lps;
        bool is_lps = b != (v & 1);
        i32 nb = is_lps ? (i32)T.renorm[lps >> 3] : (r1 < 256 ? 1 : 0);
        *ctx = is_lps ? T.next_lps[v] : T.next_mps[v];
        low = (is_lps ? low + r1 : low) << nb;
        range = (is_lps ? lps : r1) << nb;
        nbits -= nb;
        refill();
    }

    __attribute__((always_inline)) inline void bypass(i32 bins, i32 len) {
        nbyp += len;
        bins &= (1 << len) - 1;
        while (len > 0) {
            i32 cur = len < 8 ? len : 8;
            len -= cur;
            i32 chunk = (bins >> len) & ((1 << cur) - 1);
            low = (low << cur) + range * chunk;
            nbits -= cur;
            refill();
        }
    }

    void terminate(i32 b) {
        range -= 2;
        if (b) {
            low = (low + range) << 7;
            range = 2 << 7;
            nbits -= 7;
        } else if (range < 256) {
            low <<= 1; range <<= 1; nbits--;
        }
        refill();
    }

    i64 bit_len() const { return 8 * (nbytes + outstanding) + 23 - nbits; }

    void finish() {
        i32 fill;
        if (((uint32_t)low >> (32 - nbits)) > 0) {
            emit(bufbyte + 1);
            low -= (i32)(1u << (32 - nbits));
            fill = 0x00;
        } else {
            if (outstanding > 0) emit(bufbyte);
            fill = 0xFF;
        }
        for (i32 k = 0; k < outstanding - 1; k++) emit(fill);
        outstanding = 0;
        i32 tail = (i32)(((uint32_t)(low >> 8)) << nbits);
        emit(tail >> 16);
        emit(tail >> 8);
        emit(tail);
    }
};

// ---------------------------------------------------------------------------
// lane-parallel trial pricing (AVX-512)
//
// A speculative trial encode's BIN SEQUENCE never depends on arithmetic-
// coder state (HEVC residual syntax decides what to write from the block
// content alone), so the up-to-70 candidate trials forked from one node
// state can be recorded once as op streams and priced 16-at-a-time by a
// vectorized CABAC that reproduces CabacEnc's count-only semantics exactly
// (renormalization, outstanding-byte carries, emulation-prevention escape
// bytes). Decisions are unchanged by construction: costs are order-
// independent, the winner rule stays "min cost, ties to the larger
// reference index", and aborts fire only on the same one-sided proof
// (bits monotone in ops, so bits-so-far > budget implies the candidate
// provably loses). Mirrors the reference's sequential trial loop
// (reference src/HEVCe.c:1422-1484) at 16 lanes per step.
// ---------------------------------------------------------------------------

// Records the state-independent (context-index, bin) / bypass-chunk op
// sequence of one trial through the identical put_* serializer templates.
// bit_len() reports the bypass-bit floor (bypass bins cost exactly 1 bit,
// context bins >= 0), so put_coef's CG-boundary abort check stays
// one-sided: recording may only run LONGER than the scalar abort point,
// and the vector coder re-applies the exact-bits abort itself.
struct OpRecorder {
    u32* ops;
    i32 cap;
    uint64_t* touched;              // wave-shared bitmap of ctx indices used
    i32 n = 0;
    i64 floor_bits = 0;
    i64 abort_len = INT64_MAX;
    bool overflow = false;
    static constexpr u32 BYPASS = 0x80000000u;
    inline void bin(CtxSet&, i32 idx, i32 b) {
        touched[idx >> 6] |= 1ull << (idx & 63);
        if (n < cap) ops[n++] = ((u32)idx << 8) | (u32)(b != 0);
        else overflow = true;
    }
    inline void bypass(i32 bins, i32 len) {
        bins &= (i32)((1u << len) - 1);
        floor_bits += len;
        while (len > 0) {                      // same <=8-bit chunking as CabacEnc
            i32 cur = len < 8 ? len : 8;
            len -= cur;
            i32 chunk = (bins >> len) & ((1 << cur) - 1);
            if (n < cap) ops[n++] = BYPASS | ((u32)cur << 16) | (u32)chunk;
            else overflow = true;
        }
    }
    i64 bit_len() const { return floor_bits; }
};

#ifdef HEVCE_VEC_STATS
static std::atomic<i64> g_waves{0}, g_lanes{0}, g_ops{0}, g_steps{0},
    g_scalar_trials{0}, g_vec_cycles{0}, g_gen_cycles{0}, g_gen_ops{0};
#endif

#if HEVCE_VEC_TRIALS
struct VecTables {
    alignas(64) i32 lps[256];      // kLpsTable[state][q] at state*4 + q
    alignas(64) i32 nextst[256];   // next ctx byte at (v<<1) | is_lps
    alignas(64) i32 renorm[32];
    alignas(64) u8 lps_b[256];     // byte copies for VBMI permute lookups
    alignas(64) u8 nextst_b[256];
    VecTables() {
        for (int s = 0; s < 64; s++)
            for (int q = 0; q < 4; q++) lps[s * 4 + q] = kLpsTable[s][q];
        for (int v = 0; v < 128; v++) {
            nextst[(v << 1) | 0] = T.next_mps[v];
            nextst[(v << 1) | 1] = T.next_lps[v];
        }
        for (int i = 0; i < 32; i++) renorm[i] = T.renorm[i];
        for (int i = 0; i < 256; i++) {
            lps_b[i] = (u8)lps[i];
            nextst_b[i] = (u8)nextst[i];
        }
    }
};
static const VecTables VT;

#ifdef __AVX512VBMI__
// 256-entry u8 table lookup for 16 dword-lane indices via two 128-byte
// permutes + a bit-7 blend — ~3x lower latency than a gather, and the lps
// lookup sits on the serial range-update chain of every step
static inline __m512i vec_lut256(const u8* tab, __m512i idx) {
    const __m512i t0 = _mm512_load_si512((const __m512i*)tab);
    const __m512i t1 = _mm512_load_si512((const __m512i*)(tab + 64));
    const __m512i t2 = _mm512_load_si512((const __m512i*)(tab + 128));
    const __m512i t3 = _mm512_load_si512((const __m512i*)(tab + 192));
    const __m512i idxb = _mm512_castsi128_si512(_mm512_cvtepi32_epi8(idx));
    const __m512i lo = _mm512_permutex2var_epi8(t0, idxb, t1);
    const __m512i hi = _mm512_permutex2var_epi8(t2, idxb, t3);
    const __mmask64 m7 = _mm512_movepi8_mask(idxb);   // bit 7 of each index
    const __m512i r = _mm512_mask_blend_epi8(m7, lo, hi);
    return _mm512_cvtepu8_epi32(_mm512_castsi512_si128(r));
}
#endif

static inline i32 rd_cost(i32 qpd6, i32 dist, i32 bits);  // defined below

// Exact bit_len deltas for up to 16 recorded op streams forked from
// (oe, oc), in lockstep. Lane w reads gbuf[w*lane_stride + t] for
// t < oplen[w]. out_bits[w] = exact delta, or I32_MAX once the delta
// provably exceeds the lane's bit budget. Per-lane arithmetic is a
// transliteration of CabacEnc::bin/bypass/refill/emit in count-only mode.
//
// Budget tightening mirrors the sequential trial loop's: budgets derive
// from a running best cost via the same one-sided proof (bits > (best -
// dist_floor)/w_bits implies cost > best STRICTLY, so even a tie-winner is
// never dropped). Whenever a lane COMPLETES, its exact cost lowers the
// running best and every other lane's budget retightens — so a wave prunes
// almost as hard as 16 sequential trials. best_in only seeds pruning; the
// caller re-derives the winner (and tie rule) from out_bits.
static void vec_trial_bits(const CabacEnc& oe, const CtxSet& oc,
                           const u32* gbuf, i32 lane_stride,
                           const i32* oplen, i32 nlanes,
                           i32 qpd6, i32 wbits, i32 best_in,
                           const i32* sse, const i32* c1,
                           const uint64_t* touched_map, i32* out_bits) {
    alignas(64) i32 ctxv[NUM_CTX * 16];
    for (i32 i = 0; i < NUM_CTX; i++)
        if (touched_map[i >> 6] & (1ull << (i & 63)))
            _mm512_store_si512((__m512i*)&ctxv[i * 16], _mm512_set1_epi32(oc.v[i]));

    const __m512i lane = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7,
                                           8, 9, 10, 11, 12, 13, 14, 15);
    const __m512i c255 = _mm512_set1_epi32(255);
    const __m512i c1v = _mm512_set1_epi32(1);
    __m512i vrange = _mm512_set1_epi32(oe.range);
    __m512i vlow = _mm512_set1_epi32(oe.low);
    __m512i vnbits = _mm512_set1_epi32(oe.nbits);
    __m512i vout = _mm512_set1_epi32(oe.outstanding);
    __m512i vbuf = _mm512_set1_epi32(oe.bufbyte);
    __m512i vzrun = _mm512_set1_epi32(oe.zrun);
    __m512i vnby = _mm512_setzero_si512();          // emitted-byte delta
    i32 best = best_in;
    alignas(64) i32 len_a[16], bud_a[16];
    auto budget_of = [&](i32 w) -> i32 {
        // same arithmetic as process_cu's bit_budget; < 0 = provably loses
        if (c1[w] > best) return -1;
        i64 b = (i64)(best - c1[w]) / wbits;
        return (i32)(b > (1 << 30) ? (1 << 30) : b);
    };
    i32 max_len = 0;
    for (i32 w = 0; w < 16; w++) {
        len_a[w] = w < nlanes ? oplen[w] : 0;
        bud_a[w] = w < nlanes ? budget_of(w) : -1;
        if (len_a[w] > max_len) max_len = len_a[w];
    }
    const __m512i vlen = _mm512_load_si512((const __m512i*)len_a);
    __m512i vbud = _mm512_load_si512((const __m512i*)bud_a);
    const __m512i base_out = _mm512_set1_epi32(oe.outstanding);
    const __m512i base_nbits = _mm512_set1_epi32(oe.nbits);
    const __m512i gstep = _mm512_mullo_epi32(lane, _mm512_set1_epi32(lane_stride));
    __mmask16 alive = (__mmask16)((1u << nlanes) - 1);
    __mmask16 aborted = 0;
    __m512i vbits = _mm512_setzero_si512();

    for (i32 t = 0; t < max_len; t++) {
        const __m512i vt = _mm512_set1_epi32(t);
        const __mmask16 act = alive & _mm512_cmplt_epi32_mask(vt, vlen);
        if (!act) break;
#ifdef HEVCE_VEC_STATS_FINE
        g_steps++;
        g_ops += __builtin_popcount(act);
#endif
        const __m512i op = _mm512_mask_i32gather_epi32(
            _mm512_setzero_si512(), act, _mm512_add_epi32(gstep, vt), gbuf, 4);
        const __mmask16 is_byp =
            act & _mm512_test_epi32_mask(op, _mm512_set1_epi32((i32)0x80000000));
        const __mmask16 is_ctx = act & ~is_byp;

        // context-coded bin (CabacEnc::bin, branchless form)
        const __m512i cidx = _mm512_and_si512(_mm512_srli_epi32(op, 8), c255);
        const __m512i gidxc = _mm512_add_epi32(_mm512_slli_epi32(cidx, 4), lane);
        const __m512i v = _mm512_mask_i32gather_epi32(
            _mm512_setzero_si512(), is_ctx, gidxc, ctxv, 4);
        const __m512i q2 =
            _mm512_and_si512(_mm512_srli_epi32(vrange, 6), _mm512_set1_epi32(3));
        const __m512i lpsidx =
            _mm512_or_si512(_mm512_slli_epi32(_mm512_srli_epi32(v, 1), 2), q2);
#ifdef __AVX512VBMI__
        const __m512i lps = vec_lut256(VT.lps_b, lpsidx);
#else
        const __m512i lps =
            _mm512_mask_i32gather_epi32(c1v, is_ctx, lpsidx, VT.lps, 4);
#endif
        const __m512i r1 = _mm512_sub_epi32(vrange, lps);
        const __mmask16 mlps =
            is_ctx & _mm512_cmpneq_epi32_mask(_mm512_and_si512(op, c1v),
                                              _mm512_and_si512(v, c1v));
        const __m512i renlo = _mm512_load_si512((const __m512i*)VT.renorm);
        const __m512i renhi = _mm512_load_si512((const __m512i*)(VT.renorm + 16));
        const __m512i nb_lps =
            _mm512_permutex2var_epi32(renlo, _mm512_srli_epi32(lps, 3), renhi);
        const __mmask16 m_r1lt = _mm512_cmplt_epi32_mask(r1, _mm512_set1_epi32(256));
        __m512i nb = _mm512_maskz_mov_epi32(is_ctx & ~mlps & m_r1lt, c1v);
        nb = _mm512_mask_mov_epi32(nb, mlps, nb_lps);
        const __m512i nsidx = _mm512_add_epi32(_mm512_slli_epi32(v, 1),
                                               _mm512_maskz_mov_epi32(mlps, c1v));
#ifdef __AVX512VBMI__
        const __m512i ns = vec_lut256(VT.nextst_b, nsidx);
#else
        const __m512i ns =
            _mm512_mask_i32gather_epi32(v, is_ctx, nsidx, VT.nextst, 4);
#endif
        _mm512_mask_i32scatter_epi32(ctxv, is_ctx, gidxc, ns, 4);
        const __m512i low_c =
            _mm512_sllv_epi32(_mm512_mask_add_epi32(vlow, mlps, vlow, r1), nb);
        const __m512i rng_c =
            _mm512_sllv_epi32(_mm512_mask_mov_epi32(r1, mlps, lps), nb);

        // bypass chunk (CabacEnc::bypass, one <=8-bit chunk per op)
        const __m512i cur =
            _mm512_and_si512(_mm512_srli_epi32(op, 16), _mm512_set1_epi32(0xF));
        const __m512i low_b = _mm512_add_epi32(
            _mm512_sllv_epi32(vlow, cur),
            _mm512_mullo_epi32(vrange, _mm512_and_si512(op, c255)));

        vlow = _mm512_mask_mov_epi32(vlow, is_ctx, low_c);
        vlow = _mm512_mask_mov_epi32(vlow, is_byp, low_b);
        vrange = _mm512_mask_mov_epi32(vrange, is_ctx, rng_c);
        __m512i consume = _mm512_maskz_mov_epi32(is_ctx, nb);
        consume = _mm512_mask_mov_epi32(consume, is_byp, cur);
        vnbits = _mm512_sub_epi32(vnbits, consume);

        // one-shot refill (CabacEnc::refill; count-only emit bookkeeping)
        const __mmask16 mrf =
            act & _mm512_cmplt_epi32_mask(vnbits, _mm512_set1_epi32(12));
        if (mrf) {
            const __m512i lead = _mm512_srlv_epi32(
                vlow, _mm512_sub_epi32(_mm512_set1_epi32(24), vnbits));
            vnbits = _mm512_mask_add_epi32(vnbits, mrf, vnbits, _mm512_set1_epi32(8));
            const __m512i lmask = _mm512_srlv_epi32(_mm512_set1_epi32(-1), vnbits);
            vlow = _mm512_mask_and_epi32(vlow, mrf, vlow, lmask);
            const __mmask16 m_ff = mrf & _mm512_cmpeq_epi32_mask(lead, c255);
            const __mmask16 m_pend = mrf & ~m_ff &
                _mm512_cmpgt_epi32_mask(vout, _mm512_setzero_si512());
            const __mmask16 m_first = mrf & ~m_ff & ~m_pend;
            vout = _mm512_mask_add_epi32(vout, m_ff, vout, c1v);
            // pending: emit(bufbyte + carry), then outstanding-1 fill bytes
            const __m512i carry = _mm512_srli_epi32(lead, 8);
            const __m512i ebyte = _mm512_and_si512(_mm512_add_epi32(vbuf, carry), c255);
            const __mmask16 mesc = m_pend &
                _mm512_cmpge_epi32_mask(vzrun, _mm512_set1_epi32(2)) &
                _mm512_cmple_epi32_mask(ebyte, _mm512_set1_epi32(3));
            vnby = _mm512_mask_add_epi32(vnby, mesc, vnby, c1v);   // escape byte
            vzrun = _mm512_mask_mov_epi32(vzrun, mesc, _mm512_setzero_si512());
            vnby = _mm512_mask_add_epi32(vnby, m_pend, vnby, c1v); // data byte
            const __mmask16 m_zero =
                m_pend & _mm512_cmpeq_epi32_mask(ebyte, _mm512_setzero_si512());
            vzrun = _mm512_mask_mov_epi32(
                vzrun, m_pend,
                _mm512_maskz_mov_epi32(m_zero, _mm512_add_epi32(vzrun, c1v)));
            const __mmask16 mfill = m_pend & _mm512_cmpgt_epi32_mask(vout, c1v);
            if (mfill) {     // rare: multiple outstanding bytes flush at once
                alignas(64) i32 a_out[16], a_car[16], a_z[16], a_n[16];
                _mm512_store_si512((__m512i*)a_out, vout);
                _mm512_store_si512((__m512i*)a_car, carry);
                _mm512_store_si512((__m512i*)a_z, vzrun);
                _mm512_store_si512((__m512i*)a_n, vnby);
                for (i32 l = 0; l < 16; l++) {
                    if (!((mfill >> l) & 1)) continue;
                    const i32 fill = (0xFF + a_car[l]) & 0xFF;
                    i32 z = a_z[l], nbyl = a_n[l];
                    for (i32 k = 0; k < a_out[l] - 1; k++) {
                        if (z >= 2 && fill <= 0x03) { nbyl++; z = 0; }
                        nbyl++;
                        z = (fill == 0) ? z + 1 : 0;
                    }
                    a_z[l] = z;
                    a_n[l] = nbyl;
                }
                vzrun = _mm512_mask_load_epi32(vzrun, mfill, a_z);
                vnby = _mm512_mask_load_epi32(vnby, mfill, a_n);
            }
            vbuf = _mm512_mask_mov_epi32(vbuf, m_pend, _mm512_and_si512(lead, c255));
            vout = _mm512_mask_mov_epi32(vout, m_pend, c1v);
            vout = _mm512_mask_mov_epi32(vout, m_first, c1v);
            vbuf = _mm512_mask_mov_epi32(vbuf, m_first, lead);
        }

        // exact bit-length delta + one-sided abort (bits are monotone)
        vbits = _mm512_add_epi32(
            _mm512_slli_epi32(
                _mm512_add_epi32(vnby, _mm512_sub_epi32(vout, base_out)), 3),
            _mm512_sub_epi32(base_nbits, vnbits));
        const __mmask16 mab = act & _mm512_cmpgt_epi32_mask(vbits, vbud);
        aborted |= mab;
        alive = (__mmask16)(alive & ~mab);

        // lane completions tighten every other lane's budget (sequential-
        // equivalent pruning; see header comment)
        const __mmask16 mfin = act & (__mmask16)~mab &
            _mm512_cmpeq_epi32_mask(vt, _mm512_sub_epi32(vlen, c1v));
        if (mfin) {
            alignas(64) i32 bits_now[16];
            _mm512_store_si512((__m512i*)bits_now, vbits);
            i32 prev = best;
            for (i32 l = 0; l < 16; l++)
                if ((mfin >> l) & 1) {
                    i32 cost = rd_cost(qpd6, sse[l], bits_now[l]);
                    if (cost < best) best = cost;
                }
            if (best < prev) {
                for (i32 w = 0; w < 16; w++)
                    bud_a[w] = w < nlanes ? budget_of(w) : -1;
                vbud = _mm512_load_si512((const __m512i*)bud_a);
            }
        }
    }
    alignas(64) i32 bits_a[16];
    _mm512_store_si512((__m512i*)bits_a, vbits);
    for (i32 w = 0; w < nlanes; w++)
        out_bits[w] = ((aborted >> w) & 1) ? I32_MAX : bits_a[w];
}
#endif  // HEVCE_VEC_TRIALS

// ---------------------------------------------------------------------------
// scan orders (generated)
// ---------------------------------------------------------------------------

enum { SCAN_DIAG = 0, SCAN_HOR = 1, SCAN_VER = 2 };

static inline i32 sig_ctx_idx(i32 sz, bool chroma, int stype, i32 y, i32 x, i32 sctx);

struct Scans {
    // scan[sz_idx][type][i] = y*sz + x  (sz_idx: 0..3 for 4/8/16/32)
    std::vector<uint16_t> tab[4][3];
    // inverse: inv[sz_idx][type][y*sz+x] = scan index (used by the decoder)
    std::vector<uint16_t> inv[4][3];
    // precomputed luma significance ctx index per scan position and
    // neighbor-CG pattern: sig_ctx[sz_idx][type][sctx(4)][i]
    std::vector<u8> sig[4][3][4];
    void fill_sig_ctx();
    Scans() {
        for (int si = 0; si < 4; si++) {
            int sz = 4 << si, ncg = sz / 4;
            for (int ty = 0; ty < 3; ty++) {
                if (ty != SCAN_DIAG && sz > 8) continue;
                std::vector<std::pair<int, int>> cg, in;
                auto diag = [](int n) {
                    std::vector<std::pair<int, int>> o;
                    for (int d = 0; d < 2 * n - 1; d++)
                        for (int y = (d < n ? d : n - 1); y >= 0; y--) {
                            int x = d - y;
                            if (x < n) o.push_back({y, x});
                        }
                    return o;
                };
                if (ty == SCAN_DIAG) { cg = diag(ncg); in = diag(4); }
                else if (ty == SCAN_HOR) {
                    for (int y = 0; y < ncg; y++) for (int x = 0; x < ncg; x++) cg.push_back({y, x});
                    for (int y = 0; y < 4; y++) for (int x = 0; x < 4; x++) in.push_back({y, x});
                } else {
                    for (int x = 0; x < ncg; x++) for (int y = 0; y < ncg; y++) cg.push_back({y, x});
                    for (int x = 0; x < 4; x++) for (int y = 0; y < 4; y++) in.push_back({y, x});
                }
                auto& t = tab[si][ty];
                for (auto& c : cg)
                    for (auto& p : in)
                        t.push_back((uint16_t)((c.first * 4 + p.first) * sz + c.second * 4 + p.second));
                auto& v = inv[si][ty];
                v.resize(t.size());
                for (size_t i = 0; i < t.size(); i++) v[t[i]] = (uint16_t)i;
            }
        }
    }
};
static Scans SC_mut;
static const Scans& SC = SC_mut;

void Scans::fill_sig_ctx() {
    for (int si = 0; si < 4; si++) {
        int sz = 4 << si;
        for (int ty = 0; ty < 3; ty++) {
            if (tab[si][ty].empty()) continue;
            for (int sc = 0; sc < 4; sc++) {
                auto& s = sig[si][ty][sc];
                s.resize(sz * sz);
                for (int i = 0; i < sz * sz; i++) {
                    int p = tab[si][ty][i];
                    s[i] = (u8)sig_ctx_idx(sz, false, ty, p / sz, p % sz, sc);
                }
            }
        }
    }
}
static const bool SC_init = [] { SC_mut.fill_sig_ctx(); return true; }();

static inline int scan_select(int sz, int pmode, const uint16_t** scan) {
    int si = sz == 4 ? 0 : sz == 8 ? 1 : sz == 16 ? 2 : 3;
    if (sz <= 8) {
        int dv = pmode - 26; if (dv < 0) dv = -dv;
        int dh = pmode - 10; if (dh < 0) dh = -dh;
        if (dv <= 4) { *scan = SC.tab[si][SCAN_HOR].data(); return SCAN_HOR; }
        if (dh <= 4) { *scan = SC.tab[si][SCAN_VER].data(); return SCAN_VER; }
    }
    *scan = SC.tab[si][SCAN_DIAG].data();
    return SCAN_DIAG;
}

// ---------------------------------------------------------------------------
// syntax writers
// ---------------------------------------------------------------------------

static const u8 kGroupIdx[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7,
                                 8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9, 9, 9};
static const u8 kMinInGroup[10] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24};
static const u8 kLastAddr[2][5] = {{0, 1, 2, 0, 3}, {4, 4, 4, 0, 4}};
static const u8 kLastSft[2][5] = {{0, 1, 1, 0, 1}, {0, 1, 2, 0, 3}};
static const u8 kSig4[4][4] = {{0, 1, 4, 5}, {2, 3, 4, 5}, {6, 6, 8, 8}, {7, 7, 8, 8}};
static const u8 kSigPos[7] = {2, 1, 1, 0, 0, 0, 0};

// The put_* writers are templated over the sink: CabacEnc (live encode /
// count-only trial) or OpRecorder (records the state-independent bin
// sequence for the lane-parallel vector trial coder below).
template <class S>
static inline void put_split_cu(S& e, CtxSet& c, i32 sz, i32 split, i32 gl, i32 ga) {
    if (sz >= 16) e.bin(c, CTX_SPLIT_CU + (gl ? 1 : 0) + (ga ? 1 : 0), split);
}

template <class S>
static inline void put_part_size(S& e, CtxSet& c, i32 sz, i32 nxn) {
    if (sz == 8) e.bin(c, CTX_PARTSIZE, nxn ? 0 : 1);
}

static void probable_modes(i32 left, i32 above, i32 out[3]) {
    if (left != above) {
        out[0] = left; out[1] = above;
        if (left != 0 && above != 0) out[2] = 0;
        else if (left + above < 2) out[2] = 26;
        else out[2] = 1;
    } else if (left > 1) {
        out[0] = left;
        out[1] = ((left + 29) % 32) + 2;
        out[2] = ((left - 1) % 32) + 2;
    } else {
        out[0] = 0; out[1] = 1; out[2] = 26;
    }
}

template <class S>
static void put_y_pmode(S& e, CtxSet& c, int n, const i32* pm, const i32* pl, const i32* pa) {
    i32 mpm[4][3], hit[4];
    for (int i = 0; i < n; i++) {
        probable_modes(pl[i], pa[i], mpm[i]);
        hit[i] = -1;
        for (int j = 0; j < 3; j++)
            if (mpm[i][j] == pm[i]) hit[i] = j;
        e.bin(c, CTX_Y_PMODE, hit[i] >= 0);
    }
    for (int i = 0; i < n; i++) {
        if (hit[i] >= 0) {
            e.bypass(hit[i] > 0, 1);
            if (hit[i] > 0) e.bypass(hit[i] - 1, 1);
        } else {
            i32 rem = pm[i];
            for (int j = 0; j < 3; j++)
                if (pm[i] > mpm[i][j]) rem--;
            e.bypass(rem, 5);
        }
    }
}

template <class S>
static inline void put_uv_pmode(S& e, CtxSet& c) { e.bin(c, CTX_UV_PMODE, 0); }

template <class S>
static inline void put_split_tu(S& e, CtxSet& c, i32 sz, i32 split) {
    if (sz == 32) e.bin(c, CTX_SPLIT_TU + 0, split);
    else if (sz == 16) e.bin(c, CTX_SPLIT_TU + 1, split);
    else if (sz == 8) e.bin(c, CTX_SPLIT_TU + 2, split);
}

template <class S>
static inline void put_qt_cbf(S& e, CtxSet& c, i32 depth, bool chroma, i32 cbf) {
    if (chroma) e.bin(c, CTX_UV_QT_CBF + depth, cbf);
    else e.bin(c, CTX_Y_QT_CBF + (depth ? 0 : 1), cbf);
}

template <class S>
static void put_last_xy(S& e, CtxSet& c, i32 sz, bool chroma, int stype, i32 y, i32 x) {
    int szi = sz / 8;
    i32 addr = kLastAddr[chroma][szi], sft = kLastSft[chroma][szi];
    i32 ty = (stype == SCAN_VER) ? x : y;
    i32 tx = (stype == SCAN_VER) ? y : x;
    i32 gy = kGroupIdx[ty], gx = kGroupIdx[tx], gmax = kGroupIdx[sz - 1];
    for (i32 i = 0; i < gx; i++) e.bin(c, CTX_LAST_X + 5 * addr + (i >> sft), 1);
    if (gx < gmax) e.bin(c, CTX_LAST_X + 5 * addr + (gx >> sft), 0);
    for (i32 i = 0; i < gy; i++) e.bin(c, CTX_LAST_Y + 5 * addr + (i >> sft), 1);
    if (gy < gmax) e.bin(c, CTX_LAST_Y + 5 * addr + (gy >> sft), 0);
    if (gx > 3) {
        tx -= kMinInGroup[gx];
        for (i32 i = ((gx - 2) >> 1) - 1; i >= 0; i--) e.bypass((tx >> i) & 1, 1);
    }
    if (gy > 3) {
        ty -= kMinInGroup[gy];
        for (i32 i = ((gy - 2) >> 1) - 1; i >= 0; i--) e.bypass((ty >> i) & 1, 1);
    }
}

static inline i32 sig_ctx_idx(i32 sz, bool chroma, int stype, i32 y, i32 x, i32 sctx) {
    i32 base = chroma ? 28 : 0;
    if (y == 0 && x == 0) return base;
    if (sz == 4) return base + kSig4[y][x];
    base += 9;
    if (!chroma) {
        if (sz >= 16) base += 12;
        if (sz == 8 && stype != SCAN_DIAG) base += 6;
        if ((y >> 2) || (x >> 2)) base += 3;
    } else if (sz >= 16) base += 3;
    switch (sctx) {
        case 0: return base + kSigPos[(y & 3) + (x & 3)];
        case 1: return base + kSigPos[(y & 3) << 1];
        case 2: return base + kSigPos[(x & 3) << 1];
        default: return base + 2;
    }
}

template <class S>
static void put_exgolomb(S& e, i32 value, i32 rparam) {
    if (value < (3 << rparam)) {
        i32 len = value >> rparam;
        e.bypass((1 << (len + 1)) - 2, len + 1);
        e.bypass(value % (1 << rparam), rparam);
    } else {
        i32 len = rparam;
        value -= 3 << rparam;
        while (value >= (1 << len)) { value -= 1 << len; len++; }
        i32 pre = 4 + len - rparam;
        e.bypass((1 << pre) - 2, pre);
        e.bypass(value, len);
    }
}

// full residual coding of a quantized TU; blk has stride = sz
template <int SZ, class S>
static void put_coef_t(S& e, CtxSet& c, bool chroma, i32 pmode, const i32* blk) {
    constexpr i32 sz = SZ;
    const uint16_t* scan;
    int stype = scan_select(sz, pmode, &scan);
    constexpr i32 ncg = sz / 4;
    constexpr int si = sz == 4 ? 0 : sz == 8 ? 1 : sz == 16 ? 2 : 3;
    const u8* sigtab = SC.sig[si][stype][0].data();   // re-picked per CG

    // last-significant scan index + CG occupancy via a raster pass over the
    // block and the inverse scan table (linear loads autovectorize; the
    // scan-order gather form did not)
    bool sig_map[8][8] = {};
    i32 i_last = 0;
    const uint16_t* inv = SC.inv[si][stype].data();
    for (i32 p = 0; p < sz * sz; p++) {
        if (blk[p] != 0) {
            sig_map[(p / sz) >> 2][(p % sz) >> 2] = true;
            i32 i = inv[p];
            if (i > i_last) i_last = i;
        }
    }
    put_last_xy(e, c, sz, chroma, stype, scan[i_last] / sz, scan[i_last] % sz);

    i32 sctx = 0, c1 = 1, nnz = 0, signs = 0;
    i32 abs_nz[16];
    for (i32 i = i_last; i >= 0; i--) {
        i32 p = scan[i];
        i32 y = p / sz, x = p % sz;
        i32 ycg = y >> 2, xcg = x >> 2;
        bool sig_cg = sig_map[ycg][xcg];
        i32 v = blk[p];
        bool is_final = (i == i_last);
        bool first_cg = (ycg == 0 && xcg == 0);
        bool first_in_cg = (i & 15) == 0;
        bool final_in_cg = ((i & 15) == 15) || is_final;

        if (final_in_cg) {
            bool right = xcg < ncg - 1 && sig_map[ycg][xcg + 1];
            bool below = ycg < ncg - 1 && sig_map[ycg + 1][xcg];
            sctx = ((i32)below << 1) | (i32)right;
            sigtab = SC.sig[si][stype][sctx].data();
            nnz = 0;
            signs = 0;
            if (!first_cg && !is_final)
                e.bin(c, CTX_SIG_MAP + (sctx != 0), sig_cg);
        }
        if (!is_final && (first_cg || (sig_cg && (!first_in_cg || nnz > 0)))) {
            i32 idx = chroma ? sig_ctx_idx(sz, chroma, stype, y, x, sctx) : sigtab[i];
            e.bin(c, CTX_SIG_SC + idx, v != 0);
        }
        if (v != 0) {
            abs_nz[nnz++] = v < 0 ? -v : v;
            signs = (signs << 1) | (v < 0 ? 1 : 0);
        }
        if (first_in_cg && e.bit_len() > e.abort_len) return;  // hopeless trial
        if (first_in_cg && nnz > 0) {
            i32 cset = (chroma ? 4 : 0) + ((!chroma && !first_cg) ? 2 : 0) + (c1 == 0 ? 1 : 0);
            bool escape = nnz > 8;
            i32 c2 = -1;
            c1 = 1;
            for (i32 j = 0; j < 8 && j < nnz; j++) {
                e.bin(c, CTX_ONE_SC + 4 * cset + c1, abs_nz[j] > 1);
                if (abs_nz[j] > 1) {
                    c1 = 0;
                    if (c2 < 0) c2 = abs_nz[j] > 2;
                    else escape = true;
                } else if (c1 > 0 && c1 < 3) c1++;
            }
            if (c1 == 0 && c2 >= 0) {
                e.bin(c, CTX_ABS_SC + cset, c2);
                escape = escape || c2;
            }
            e.bypass(signs, nnz);
            if (escape) {
                i32 fc2 = 3, rparam = 0;
                for (i32 j = 0; j < nnz; j++) {
                    i32 esc = abs_nz[j] - (j < 8 ? fc2 : 1);
                    if (esc >= 0) {
                        put_exgolomb(e, esc, rparam);
                        if (abs_nz[j] > (3 << rparam)) rparam = rparam < 4 ? rparam + 1 : 4;
                    }
                    if (abs_nz[j] >= 2) fc2 = 2;
                }
            }
        }
    }
}

// size-dispatch wrapper: ~77% of trial-encode put_coef calls are 4x4
// (PU fresh rates + 8x8-node TU-split trials), where the specialized
// instantiation folds away the CG machinery entirely
template <class S>
static void put_coef(S& e, CtxSet& c, i32 sz, bool chroma, i32 pmode, const i32* blk) {
    switch (sz) {
        case 4: put_coef_t<4>(e, c, chroma, pmode, blk); break;
        case 8: put_coef_t<8>(e, c, chroma, pmode, blk); break;
        case 16: put_coef_t<16>(e, c, chroma, pmode, blk); break;
        default: put_coef_t<32>(e, c, chroma, pmode, blk); break;
    }
}

static inline bool block_nonzero(const i32* blk, i32 n) {
    for (i32 i = 0; i < n; i++)
        if (blk[i]) return true;
    return false;
}

// provable LOWER bound on put_coef's bit count for a quantized block:
//  * every nonzero coefficient emits exactly one sign bypass bit;
//  * every |level| >= 3 escapes (esc = |level| - fc2 with fc2 <= 3,
//    put_coef's greater1 bookkeeping) and put_exgolomb(esc, r) emits a
//    bit count that is monotone in esc for every rparam, so
//    min over r in [0,4] of bits(|level|-3, r) never overstates it.
// Context-coded bins are bounded below by zero. Used to SKIP hopeless
// trial encodes one-sidedly (cost > best provable), preserving ties.
static i32 kMinEscBits[512];
static inline i32 exgolomb_bits(i32 value, i32 rparam) {
    if (value < (3 << rparam)) return (value >> rparam) + 1 + rparam;
    i32 len = rparam;
    value -= 3 << rparam;
    while (value >= (1 << len)) { value -= 1 << len; len++; }
    return (4 + len - rparam) + len;
}
static const bool kMinEscInit = [] {
    for (i32 v = 0; v < 512; v++) {
        i32 b = INT32_MAX;
        for (i32 r = 0; r <= 4; r++) b = std::min(b, exgolomb_bits(v, r));
        kMinEscBits[v] = b;
    }
    return true;
}();

static i32 rate_floor(const i32* blk, i32 n) {
    i32 lb = 0;
#pragma omp simd reduction(+ : lb)
    for (i32 i = 0; i < n; i++) {
        i32 v = blk[i];
        i32 av = v < 0 ? -v : v;
        i32 idx = av - 3 < 511 ? (av - 3 > 0 ? av - 3 : 0) : 511;
        i32 esc = av >= 3 ? kMinEscBits[idx] : 0;
        lb += (v != 0) + esc;  // sign bypass + escape floor
    }
    return lb;
}

// CU serializers; blk/sub stride == their own size
template <class S>
static void put_cu_2nx2n(S& e, CtxSet& c, i32 sz, i32 pm, i32 pl, i32 pa, const i32* blk) {
    i32 cbf = block_nonzero(blk, sz * sz);
    put_part_size(e, c, sz, 0);
    put_y_pmode(e, c, 1, &pm, &pl, &pa);
    put_uv_pmode(e, c);
    put_split_tu(e, c, sz, 0);
    put_qt_cbf(e, c, 0, true, 0);
    put_qt_cbf(e, c, 0, true, 0);
    put_qt_cbf(e, c, 0, false, cbf);
    if (cbf) put_coef(e, c, sz, false, pm, blk);
}

template <class S>
static void put_cu_tusplit(S& e, CtxSet& c, i32 sz, i32 pm, i32 pl, i32 pa,
                           const i32* sub[4]) {
    i32 h = sz / 2;
    put_part_size(e, c, sz, 0);
    put_y_pmode(e, c, 1, &pm, &pl, &pa);
    put_uv_pmode(e, c);
    put_split_tu(e, c, sz, 1);
    put_qt_cbf(e, c, 0, true, 0);
    put_qt_cbf(e, c, 0, true, 0);
    for (int k = 0; k < 4; k++) {
        i32 cbf = block_nonzero(sub[k], h * h);
        put_qt_cbf(e, c, 1, false, cbf);
        if (cbf) put_coef(e, c, h, false, pm, sub[k]);
    }
}

template <class S>
static void put_cu_nxn(S& e, CtxSet& c, i32 sz, const i32* pms, const i32* pls,
                       const i32* pas, const i32* sub[4]) {
    i32 h = sz / 2;
    put_part_size(e, c, sz, 1);
    put_y_pmode(e, c, 4, pms, pls, pas);
    put_uv_pmode(e, c);
    put_qt_cbf(e, c, 0, true, 0);
    put_qt_cbf(e, c, 0, true, 0);
    for (int k = 0; k < 4; k++) {
        i32 cbf = block_nonzero(sub[k], h * h);
        put_qt_cbf(e, c, 1, false, cbf);
        if (cbf) put_coef(e, c, h, false, pms[k], sub[k]);
    }
}

// ---------------------------------------------------------------------------
// numeric math: borders, 35-mode prediction, transforms, RDOQ
// (host fallback path; the TPU device engine computes the same quantities
//  densely — see hevce_tpu/ops/*. Semantics: reference src/HEVCe.c:191-615)
// ---------------------------------------------------------------------------

static const i32 kAngle[MODES] = {0, 0, 32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9,
                                  -13, -17, -21, -26, -32, -26, -21, -17, -13, -9, -5,
                                  -2, 0, 2, 5, 9, 13, 17, 21, 26, 32};
static const i32 kInvAngle[MODES] = {0, 0, 256, 315, 390, 482, 630, 910, 1638, 4096, 0,
                                     4096, 1638, 910, 630, 482, 390, 315, 256, 315, 390,
                                     482, 630, 910, 1638, 4096, 0, 4096, 1638, 910, 630,
                                     482, 390, 315, 256};

// whether the smoothed border feeds luma prediction, by (log2(sz)-2, mode)
struct FilterFlags {
    u8 f[4][MODES];
    FilterFlags() {
        std::memset(f, 0, sizeof f);
        for (int m : {0, 2, 18, 34}) f[1][m] = 1;
        for (int m = 0; m < MODES; m++) f[2][m] = 1;
        for (int m : {1, 9, 10, 11, 25, 26, 27}) f[2][m] = 0;
        for (int m = 0; m < MODES; m++) f[3][m] = 1;
        for (int m : {1, 10, 26}) f[3][m] = 0;
    }
};
static const FilterFlags FF;

struct Borders {
    u8 ubla, fbla;
    u8 ublb[64], ubar[64], fblb[64], fbar[64];
};

// ctx_top: 1+2sz values (corner + row above), ctx_left: 2sz values
static void build_borders(i32 sz, const i32* ctx_top, const i32* ctx_left,
                          bool bll, bool blb, bool baa, bool bar, Borders& B) {
    i32 n2 = sz * 2;
    B.ubla = (u8)(bll && baa ? ctx_top[0] : bll ? ctx_left[0] : baa ? ctx_top[1] : 128);
    for (i32 i = 0; i < sz; i++) B.ublb[i] = bll ? (u8)ctx_left[i] : B.ubla;
    for (i32 i = sz; i < n2; i++) B.ublb[i] = blb ? (u8)ctx_left[i] : B.ublb[sz - 1];
    for (i32 i = 0; i < sz; i++) B.ubar[i] = baa ? (u8)ctx_top[1 + i] : B.ubla;
    for (i32 i = sz; i < n2; i++) B.ubar[i] = bar ? (u8)ctx_top[1 + i] : B.ubar[sz - 1];
    B.fbla = (u8)((2 + B.ublb[0] + B.ubar[0] + 2 * B.ubla) >> 2);
    B.fblb[0] = (u8)((2 + 2 * B.ublb[0] + B.ublb[1] + B.ubla) >> 2);
    B.fbar[0] = (u8)((2 + 2 * B.ubar[0] + B.ubar[1] + B.ubla) >> 2);
    for (i32 i = 1; i < n2 - 1; i++) {
        B.fblb[i] = (u8)((2 + 2 * B.ublb[i] + B.ublb[i - 1] + B.ublb[i + 1]) >> 2);
        B.fbar[i] = (u8)((2 + 2 * B.ubar[i] + B.ubar[i - 1] + B.ubar[i + 1]) >> 2);
    }
    B.fblb[n2 - 1] = B.ublb[n2 - 1];
    B.fbar[n2 - 1] = B.ubar[n2 - 1];
}

// predicted block for one mode; dst stride == sz (luma only)
static void predict(i32 sz, i32 pmode, const Borders& B, u8* dst) {
    int szi = sz == 4 ? 0 : sz == 8 ? 1 : sz == 16 ? 2 : 3;
    bool edge = sz <= 16;
    bool filt = FF.f[szi][pmode];
    u8 bla = filt ? B.fbla : B.ubla;
    const u8* blb = filt ? B.fblb : B.ublb;
    const u8* bar = filt ? B.fbar : B.ubar;

    if (pmode == 0) {  // planar
        for (i32 i = 0; i < sz; i++)
            for (i32 j = 0; j < sz; j++) {
                i32 hp = (sz - j - 1) * blb[i] + (j + 1) * bar[sz];
                i32 vp = (sz - i - 1) * bar[j] + (i + 1) * blb[sz];
                dst[i * sz + j] = (u8)((sz + hp + vp) / (sz * 2));
            }
    } else if (pmode == 1) {  // DC
        i32 dc = sz;
        for (i32 i = 0; i < sz; i++) dc += blb[i] + bar[i];
        dc /= sz * 2;
        for (i32 i = 0; i < sz * sz; i++) dst[i] = (u8)dc;
        if (edge) {
            dst[0] = (u8)((2 + 2 * dc + blb[0] + bar[0]) >> 2);
            for (i32 i = 1; i < sz; i++) {
                dst[i] = (u8)((2 + 3 * dc + bar[i]) >> 2);
                dst[i * sz] = (u8)((2 + 3 * dc + blb[i]) >> 2);
            }
        }
    } else if (pmode == 10) {  // pure horizontal
        for (i32 i = 0; i < sz; i++)
            for (i32 j = 0; j < sz; j++) dst[i * sz + j] = blb[i];
        if (edge)
            for (i32 j = 0; j < sz; j++)
                dst[j] = pixclip(((bar[j] - bla) >> 1) + dst[j]);
    } else if (pmode == 26) {  // pure vertical
        for (i32 i = 0; i < sz; i++)
            for (i32 j = 0; j < sz; j++) dst[i * sz + j] = bar[j];
        if (edge)
            for (i32 i = 0; i < sz; i++)
                dst[i * sz] = pixclip(((blb[i] - bla) >> 1) + dst[i * sz]);
    } else {  // angular
        bool horiz = pmode < 18;
        i32 angle = kAngle[pmode], inv = kInvAngle[pmode];
        const u8* main_ = horiz ? blb : bar;
        const u8* side = horiz ? bar : blb;
        u8 refbuf[4 * CTU + 1];
        u8* ref = refbuf + 2 * CTU;
        ref[0] = bla;
        for (i32 i = 0; i < sz * 2; i++) ref[1 + i] = side[i];
        for (i32 i = -1; i > ((sz * angle) >> 5); i--)
            ref[i] = ref[(128 - inv * i) >> 8];
        for (i32 i = 0; i < sz * 2; i++) ref[1 + i] = main_[i];
        for (i32 i = 0; i < sz; i++) {
            i32 off = angle * (i + 1);
            i32 oi = off >> 5, of = off & 31;
            for (i32 j = 0; j < sz; j++) {
                i32 p1 = ref[oi + j + 1], p2 = ref[oi + j + 2];
                u8 px = (u8)(((32 - of) * p1 + of * p2 + 16) >> 5);
                if (horiz) dst[j * sz + i] = px;
                else dst[i * sz + j] = px;
            }
        }
    }
}

// transform matrices: DCT32 stored; DCT16/8 derived by even-row subsampling
static const i32 kDst4[4][4] = {
    {29, 55, 74, 84}, {74, 74, 0, -74}, {84, -29, -74, 55}, {55, -84, 74, -29}};

struct Mats {
    i32 m32[32][32], m16[16][16], m8[8][8], m4[4][4];
    Mats() {
        // H.265 integer DCT-II basis via its defining closed form:
        // m32[k][n] = S((k*(2n+1)) mod 128) where S is the signed 128-periodic
        // extension of the canonical quarter-wave magnitude table (H.265
        // 8.6.4.2); DCT16/DCT8 are the even-row subsamples of DCT32.
        static const i32 q32[33] = {64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78, 75,
                                    73, 70, 67, 64, 61, 57, 54, 50, 46, 43, 38, 36, 31,
                                    25, 22, 18, 13, 9, 4, 0};
        auto cosv = [&](int idx) -> i32 {
            idx = ((idx % 128) + 128) % 128;
            int sign = 1;
            if (idx > 64) idx = 128 - idx;
            if (idx > 32) { idx = 64 - idx; sign = -1; }
            return sign * q32[idx];
        };
        for (int k = 0; k < 32; k++)
            for (int n = 0; n < 32; n++) m32[k][n] = cosv(k * (2 * n + 1));
        for (int k = 0; k < 16; k++)
            for (int n = 0; n < 16; n++) m16[k][n] = m32[2 * k][n];
        for (int k = 0; k < 8; k++)
            for (int n = 0; n < 8; n++) m8[k][n] = m32[4 * k][n];
        for (int k = 0; k < 4; k++)
            for (int n = 0; n < 4; n++) m4[k][n] = kDst4[k][n];
    }
    i32 t32[32][32], t16[16][16], t8[8][8], t4[4][4];  // transposes
    void fill_transposes() {
        for (int k = 0; k < 32; k++) for (int n = 0; n < 32; n++) t32[n][k] = m32[k][n];
        for (int k = 0; k < 16; k++) for (int n = 0; n < 16; n++) t16[n][k] = m16[k][n];
        for (int k = 0; k < 8; k++) for (int n = 0; n < 8; n++) t8[n][k] = m8[k][n];
        for (int k = 0; k < 4; k++) for (int n = 0; n < 4; n++) t4[n][k] = m4[k][n];
    }
    const i32* mat(i32 sz) const {
        return sz == 4 ? &m4[0][0] : sz == 8 ? &m8[0][0] : sz == 16 ? &m16[0][0] : &m32[0][0];
    }
    const i32* matT(i32 sz) const {
        return sz == 4 ? &t4[0][0] : sz == 8 ? &t8[0][0] : sz == 16 ? &t16[0][0] : &t32[0][0];
    }
};
static const Mats MT = [] { Mats m; m.fill_transposes(); return m; }();

// D = round((A @ B) >> sft): row-major saxpy form, vectorizable over j
template <int N, bool CLIP>
static void matmul_axpy(i32 sft, const i32* __restrict A, const i32* __restrict B,
                        i32* __restrict D) {
    const i32 add = 1 << sft >> 1;
    for (i32 i = 0; i < N; i++) {
        i32 acc[N];
        for (i32 j = 0; j < N; j++) acc[j] = add;
        for (i32 k = 0; k < N; k++) {
            const i32 a = A[i * N + k];
            const i32* __restrict Bk = B + k * N;
            for (i32 j = 0; j < N; j++) acc[j] += a * Bk[j];
        }
        i32* __restrict Di = D + i * N;
        if (CLIP)
            for (i32 j = 0; j < N; j++) Di[j] = coefclip(acc[j] >> sft);
        else
            for (i32 j = 0; j < N; j++) Di[j] = acc[j] >> sft;
    }
}

template <int N>
static void fwd_xform(const i32* src, i32* dst) {
    constexpr i32 a = N == 4 ? 1 : N == 8 ? 2 : N == 16 ? 3 : 4;
    i32 tmp[N * N];
    matmul_axpy<N, false>(a, MT.mat(N), src, tmp);        // M @ x
    matmul_axpy<N, false>(a + 7, tmp, MT.matT(N), dst);   // @ M^T
}

template <int N>
static void inv_xform(const i32* src, i32* dst) {
    i32 tmp[N * N];
    matmul_axpy<N, true>(7, MT.matT(N), src, tmp);        // M^T @ x
    matmul_axpy<N, true>(12, tmp, MT.mat(N), dst);        // @ M
}

static void inverse_transform(i32 sz, const i32* src, i32* dst) {
    switch (sz) {
        case 4: inv_xform<4>(src, dst); break;
        case 8: inv_xform<8>(src, dst); break;
        case 16: inv_xform<16>(src, dst); break;
        default: inv_xform<32>(src, dst); break;
    }
}

// RD cost with int32 saturation (reference src/HEVCe.c:177-185)
static const i32 kWDist[5] = {11, 11, 11, 5, 1};
static const i32 kWBits[5] = {1, 4, 16, 29, 23};
static inline i32 rd_cost(i32 qpd6, i32 dist, i32 bits) {
    i32 w1 = kWDist[qpd6], w2 = kWBits[qpd6];
    i32 c1 = (I32_MAX / w1 <= dist) ? I32_MAX : w1 * dist;
    i32 c2 = (I32_MAX / w2 <= bits) ? I32_MAX : w2 * bits;
    return (I32_MAX - c1 <= c2) ? I32_MAX : c1 + c2;
}

static inline i32 coeff_rate_fast(i32 level) {
    static const i32 tab[6] = {0, 70000, 90000, 92000, 157536, 190304};
    if (level < 6) return tab[level];
    i32 i = 31 - __builtin_clz((unsigned)(level - 6 + 1));  // floor(log2(v+1))
    return 92000 + ((4 + 2 * i) << 15);
}

// simplified RDOQ (reference src/HEVCe.c:540-595); src/dst stride sz.
// Straight-line 3-candidate selection with the reference's tie rule
// (strict <, high level first) and per-CG kill rule. BRANCHLESS two-pass
// form: pass 1 is a flat select-only loop over all coefficients (the
// data-dependent branches of the scalar form mispredicted ~50% and made
// this the hottest math stage at ~600 ns per 8x8 call; selects
// autovectorize with AVX-512 masks), pass 2 applies the per-CG kill rule
// from the per-coefficient min(dl, thr) partial sums.
template <int SZ>
static void quantize_t(i32 qpd6, const i32* __restrict src, i32* __restrict dst) {
    constexpr i32 sz = SZ, nn = SZ * SZ;
    constexpr i32 dist_sft = sz == 4 ? 8 : sz == 8 ? 7 : sz == 16 ? 6 : 5;
    const i32 sft = (sz == 4 ? 19 : sz == 8 ? 18 : sz == 16 ? 17 : 16) + qpd6;
    const i32 add = 1 << sft >> 1;
    const i32 max_dl = I32_MAX - add;
    const i32 thr = 9 << sft >> 2;
    const i32 w1 = kWDist[qpd6], w2 = kWBits[qpd6];
    const i32 t1 = I32_MAX / w1, t2 = I32_MAX / w2;

    // branchless coeff_rate_fast: select chain over the 6-entry table +
    // the closed-form tail (identical values; clz input clamped >= 1 only
    // when the tail is selected, matching the level >= 6 precondition)
    auto rate_of = [&](i32 lvl) -> i32 {
        i32 lz = lvl - 5 > 0 ? lvl - 5 : 1;
        i32 ib = 31 - __builtin_clz((unsigned)lz);
        i32 r = 92000 + ((4 + 2 * ib) << 15);
        r = lvl == 5 ? 190304 : r;
        r = lvl == 4 ? 157536 : r;
        r = lvl == 3 ? 92000 : r;
        r = lvl == 2 ? 90000 : r;
        r = lvl == 1 ? 70000 : r;
        r = lvl == 0 ? 0 : r;
        return r;
    };
    auto cost_of = [&](i32 dl, i32 lvl) -> i32 {
        i32 d1 = dl - (lvl << sft);
        d1 = d1 < 0 ? -d1 : d1;
        d1 >>= dist_sft;
        i32 d = ((d1 < 46340) ? d1 * d1 : I32_MAX) >> 7;
        i32 r = rate_of(lvl);
        i32 c1 = (t1 <= d) ? I32_MAX : w1 * d;
        i32 c2 = (t2 <= r) ? I32_MAX : w2 * r;
        return (I32_MAX - c1 <= c2) ? I32_MAX : c1 + c2;
    };

    i32 m[nn];                      // min(dl, thr) per coefficient
#pragma omp simd
    for (i32 i = 0; i < nn; i++) {
        i32 v = src[i];
        i32 av = v < 0 ? -v : v;
        i32 dl0 = (av & 0x1ffff) << 14;
        i32 dl = (int(av > 0x1ffff) | int(dl0 >= max_dl)) ? max_dl : dl0;
        i32 l0 = coefclip((dl + add) >> sft);
        // three candidates l0 / l0-1 / l0-2, invalid ones masked to
        // I32_MAX (strict < keeps the higher level on ties, as the
        // reference's in-order compare does); l0 == 0 falls out naturally
        // (only candidate is 0 -> bl = 0)
        i32 bl = l0;
        i32 bc = cost_of(dl, l0);
        i32 lA = l0 - 1 > 0 ? l0 - 1 : 0;
        i32 cA = l0 >= 1 ? cost_of(dl, lA) : I32_MAX;
        bl = cA < bc ? lA : bl;
        bc = cA < bc ? cA : bc;
        i32 lB = l0 - 2 > 0 ? l0 - 2 : 0;
        i32 cB = l0 >= 2 ? cost_of(dl, lB) : I32_MAX;
        bl = cB < bc ? lB : bl;
        dst[i] = v < 0 ? -bl : bl;
        m[i] = dl < thr ? dl : thr;
    }

    // per-CG kill rule (cg_sum accumulates min(dl, thr); for l0 == 0 the
    // scalar form added dl unclamped, but there dl < 2^sft < thr so the
    // two agree)
    for (i32 yc = 0; yc < sz; yc += 4)
        for (i32 xc = 0; xc < sz; xc += 4) {
            i32 cg_sum = 0;
            for (i32 y = yc; y < yc + 4; y++)
                for (i32 x = xc; x < xc + 4; x++) cg_sum += m[y * sz + x];
            if (cg_sum < thr)
                for (i32 y = yc; y < yc + 4; y++)
                    for (i32 x = xc; x < xc + 4; x++) dst[y * sz + x] = 0;
        }
}

static void dequantize(i32 qpd6, i32 sz, const i32* src, i32* dst) {
    i32 q = (sz == 4 ? 5 : sz == 8 ? 4 : sz == 16 ? 3 : 2) + qpd6;
    for (i32 i = 0; i < sz * sz; i++) dst[i] = coefclip(src[i] << q);
}

// ---------------------------------------------------------------------------
// RD search engine (semantics of reference src/HEVCe.c:1346-1560 / the
// validated Python arbiter, hevce_tpu/models/encoder.py)
// ---------------------------------------------------------------------------

struct MathProvider;

// worst-case stream capacity for a padded yszn x xszn image: the reference
// bounds each CTU's entropy payload by TMPBUF_LEN = 3*CTU^2+128 bytes
// (reference src/HEVCe.c:795-806, incl. emulation-prevention inserts), i.e.
// 3.125 B/pixel, plus headers/terminators. A 512x512 noise image at qpd6=0
// really does exceed 1 B/pixel (343,218 B measured), so the old
// pixels + 64KiB sizing was a heap overflow on valid input.
static inline size_t stream_capacity(i32 yszn, i32 xszn) {
    size_t px = (size_t)yszn * xszn;
    return px * 3 + px / 8 + (1 << 16);
}

struct EncState {
    i32 qpd6;
    i32 ysz0, xsz0;        // unpadded dims (original-pixel clamping)
    i32 yszn, xszn;        // padded dims
    const u8* img;
    std::vector<u8> rcon;  // (yszn, xszn) reconstructed plane
    std::vector<u8> map_cu_sz, map_pmode;  // (9, 1 + xszn/4) line buffers
    i32 map_w;
    i32 ctu_y;
    CabacEnc enc;
    CtxSet ctxs;
    std::vector<u8> arena;   // shared byte arena (coder output since last drain)
    MathProvider* mp = nullptr;
    // optional device-oracle hints (wavefront fast-mode decisions): per-CTU
    // 106 int8 = [lay 21 | pm 21 | pm4 64] in raster CTU order. Hints only
    // REORDER trial evaluation (best-guess candidate first, so the running
    // best tightens immediately and the provable prunes bite) — decisions
    // and streams are bit-identical with or without them.
    const int8_t* hints = nullptr;
    i32 hint_cols = 0;

    // clamped reads
    inline u8 rc(i32 y, i32 x) const {
        y = iclip(y, 0, yszn - 1);
        x = iclip(x, 0, xszn - 1);
        return rcon[(size_t)y * xszn + x];
    }
    inline u8 og(i32 y, i32 x) const {
        y = iclip(y, 0, ysz0 - 1);
        x = iclip(x, 0, xsz0 - 1);
        return img[(size_t)y * xsz0 + x];
    }
    inline i32 mrow(i32 y) const { return 1 + (y - ctu_y) / 4; }
    inline u8& mcu(i32 r, i32 c) { return map_cu_sz[(size_t)r * map_w + c]; }
    inline u8& mpm(i32 r, i32 c) { return map_pmode[(size_t)r * map_w + c]; }
};

struct NodeMath {
    // all-35-mode candidates for one node, COMPACT layout: mode stride is
    // sz*sz (same layout the batched device path uses), not CTU*CTU.
    i32 quant[MODES * CTU * CTU];          // [pm*sz*sz + i]
    u8 recon[MODES * CTU * CTU];
    i32 sse[MODES];
    i32 quant4[MODES * CTU * CTU];         // [pm*sz*sz + isub*h*h + i]
    u8 recon4[MODES * CTU * CTU];
    i32 sse4[MODES];
};

// pointer view over one node's candidate math; the arbiter only reads through
// this, so results may live in provider-local storage or in a shared batch
// buffer filled by the TPU device engine.
struct NodeMathRefs {
    const i32* quant;   // [35][sz*sz]
    const u8* recon;    // [35][sz*sz]
    const i32* sse;     // [35]
    const i32* quant4;  // [35][4][(sz/2)*(sz/2)]
    const u8* recon4;   // [35][sz*sz]
    const i32* sse4;    // [35]
    const i32* rates2;  // [35] trial CABAClen deltas vs the fork state from
    const i32* rates3;  // [35] the device rate oracle; nullptr / -1 -> host
};

struct PuMathRefs {
    const i32* quant;   // [35][16]
    const u8* recon;    // [35][16]
    const i32* sse;     // [35]
    const i32* rates;   // [35] fresh-coder putCoef CABAClen from the device
                        //      rate oracle, or nullptr / -1 entries -> the
                        //      arbiter trial-encodes on the host instead
};

struct NodeMeta {   // header-coding context for device-side trial rates
    i32 pml, pma;   // left/above pmode (MPM context)
    i32 gl, ga;     // larger-than-left/above (split-flag context)
};

struct MathProvider {
    // all-35-mode candidates for a CU node (both TU layouts); rates2/rates3
    // in the refs may be nullptr or contain -1 -> host computes those trials
    virtual NodeMathRefs node(EncState& st, i32 y, i32 x, i32 sz,
                              bool bll, bool blb, bool baa, bool bar,
                              const NodeMeta& meta) = 0;
    // all-35-mode 4x4 PU candidates (step-4 inner search)
    virtual PuMathRefs pu(EncState& st, i32 py, i32 px,
                          bool bll, bool blb, bool baa, bool bar) = 0;
    // Two-phase (deferred-fetch) providers return true: after node()/pu(),
    // only sse and rates in the refs are valid; quant/recon become valid
    // only after fetch_node()/fetch_pu(), which MUST be called exactly once
    // per node()/pu() (the batch engine rendezvouses on it). sel: -2 = no
    // data needed, -1 = all lanes, >=0 = one flat lane (layout*35+pm for
    // nodes, pm for PUs). This is what cuts the device->host volume ~600x:
    // candidates stay on the device; only the winner's blocks ever transfer.
    virtual bool deferred() const { return false; }
    virtual void fetch_node(i32 sel) { (void)sel; }
    virtual void fetch_pu(i32 sel) { (void)sel; }
    virtual ~MathProvider() = default;
};

// border context slices for a node at (y, x) size sz
static void ctx_slices(const EncState& st, i32 y, i32 x, i32 sz, i32* top, i32* left) {
    for (i32 j = 0; j < 1 + 2 * sz; j++) top[j] = st.rc(y - 1, x - 1 + j);
    for (i32 i = 0; i < 2 * sz; i++) left[i] = st.rc(y + i, x - 1);
}

static const i32 kSubOff[4][2] = {{0, 0}, {0, 1}, {1, 0}, {1, 1}};

static void sub_flags(bool bll, bool blb, bool baa, bool bar, bool out[4][4]) {
    const bool f[4][4] = {{bll, bll, baa, baa},
                          {true, false, baa, bar},
                          {bll, blb, true, true},
                          {true, false, true, false}};
    std::memcpy(out, f, sizeof f);
}

// single-mode candidate pipeline; returns SSE. Templated on the block size
// so the residual/recon/SSE loops have constexpr trip counts (they fully
// vectorize; this path is the single hottest function in the encode).
// orig is a compact sz-stride block (all callers repack).
template <int N>
static i32 candidate_t(i32 qpd6, const Borders& B, i32 pmode, const u8* orig,
                       i32* quant_out, u8* recon_out) {
    constexpr i32 sz = N, nn = N * N;
    u8 pred[nn];
    i32 resid[nn], coef[nn], dq[nn], inv[nn];
    predict(sz, pmode, B, pred);
    for (i32 i = 0; i < nn; i++) resid[i] = (i32)orig[i] - pred[i];
    fwd_xform<N>(resid, coef);
    quantize_t<N>(qpd6, coef, quant_out);
    if (!block_nonzero(quant_out, nn)) {
        // all-zero levels: dequant/inverse are exactly zero (rounding adds
        // shift out), so recon == pred — skip both matmul stages
        i32 sse = 0;
        for (i32 i = 0; i < nn; i++) {
            recon_out[i] = pred[i];
            i32 d = (i32)orig[i] - pred[i];
            sse += d * d;
        }
        return sse;
    }
    constexpr i32 dqsft = (N == 4 ? 5 : N == 8 ? 4 : N == 16 ? 3 : 2);
    for (i32 i = 0; i < nn; i++) dq[i] = coefclip(quant_out[i] << (dqsft + qpd6));
    inv_xform<N>(dq, inv);
    i32 sse = 0;
    for (i32 i = 0; i < nn; i++) {
        u8 r = pixclip(inv[i] + pred[i]);
        recon_out[i] = r;
        i32 d = (i32)orig[i] - r;
        sse += d * d;
    }
    return sse;
}

static i32 candidate(i32 qpd6, i32 sz, const Borders& B, i32 pmode, const u8* orig,
                     i32 orig_stride, i32* quant_out, u8* recon_out) {
    (void)orig_stride;  // all callers pass compact blocks (stride == sz)
    switch (sz) {
        case 4: return candidate_t<4>(qpd6, B, pmode, orig, quant_out, recon_out);
        case 8: return candidate_t<8>(qpd6, B, pmode, orig, quant_out, recon_out);
        case 16: return candidate_t<16>(qpd6, B, pmode, orig, quant_out, recon_out);
        default: return candidate_t<32>(qpd6, B, pmode, orig, quant_out, recon_out);
    }
}

// single-mode TU-split chain for one node: the 4 chained sub-TU quants and
// the (sz, sz) recon canvas for ONE pmode. Shared by node_math's per-mode
// dense loop and the fast-mode pack replay (pack_stream_img), so the two
// paths compute byte-identical sub-TU border context by construction.
static void tusplit_mode(i32 qpd6, i32 sz, const i32* top, const i32* left,
                         const bool sf[4][4], i32 pm, const u8* orig,
                         i32* quant4_out, u8* canvas) {
    const i32 h = sz / 2;
    for (int isub = 0; isub < 4; isub++) {
        i32 oy = kSubOff[isub][0] * h, ox = kSubOff[isub][1] * h;
        i32 stop[1 + 2 * CTU], sleft[2 * CTU];
        // assemble sub-TU border context from outer ctx + canvas
        for (i32 j = 0; j < 1 + 2 * h; j++) {
            i32 gy = oy - 1, gx = ox - 1 + j;
            stop[j] = (gy < 0) ? top[1 + iclip(gx, -1, 2 * sz - 1)]
                      : (gx < 0) ? left[gy]
                      : canvas[gy * sz + iclip(gx, 0, sz - 1)];
        }
        for (i32 i = 0; i < 2 * h; i++) {
            i32 gy = oy + i, gx = ox - 1;
            sleft[i] = (gx < 0) ? left[iclip(gy, 0, 2 * sz - 1)]
                       : canvas[iclip(gy, 0, sz - 1) * sz + gx];
        }
        Borders SB;
        build_borders(h, stop, sleft, sf[isub][0], sf[isub][1], sf[isub][2], sf[isub][3], SB);
        u8 srecon[CTU * CTU / 4];
        u8 sorig[CTU * CTU / 4];
        for (i32 i = 0; i < h; i++)
            for (i32 j = 0; j < h; j++) sorig[i * h + j] = orig[(oy + i) * sz + ox + j];
        candidate(qpd6, h, SB, pm, sorig, h, quant4_out + isub * h * h, srecon);
        for (i32 i = 0; i < h; i++)
            for (i32 j = 0; j < h; j++) canvas[(oy + i) * sz + ox + j] = srecon[i * h + j];
    }
}

// host math engine: fills NodeMath for one node (the TPU device engine fills
// the same shapes on the batched path)
static void node_math(EncState& st, i32 y, i32 x, i32 sz,
                      bool bll, bool blb, bool baa, bool bar, NodeMath& M) {
    i32 top[1 + 2 * CTU], left[2 * CTU];
    ctx_slices(st, y, x, sz, top, left);
    u8 orig[CTU * CTU];
    for (i32 i = 0; i < sz; i++)
        for (i32 j = 0; j < sz; j++) orig[i * sz + j] = st.og(y + i, x + j);

    Borders B;
    build_borders(sz, top, left, bll, blb, baa, bar, B);
    for (i32 pm = 0; pm < MODES; pm++)
        M.sse[pm] = candidate(st.qpd6, sz, B, pm, orig, sz,
                              M.quant + (size_t)pm * sz * sz,
                              M.recon + (size_t)pm * sz * sz);

    // TU-split: per-mode chained sub-TUs over a per-mode canvas
    bool sf[4][4];
    sub_flags(bll, blb, baa, bar, sf);
    for (i32 pm = 0; pm < MODES; pm++) {
        u8* canvas = M.recon4 + (size_t)pm * sz * sz;  // (sz, sz), stride sz
        tusplit_mode(st.qpd6, sz, top, left, sf, pm, orig,
                     M.quant4 + (size_t)pm * sz * sz, canvas);
        i32 sse = 0;
        for (i32 i = 0; i < sz * sz; i++) {
            i32 d = (i32)orig[i] - canvas[i];
            sse += d * d;
        }
        M.sse4[pm] = sse;
    }
}

// saturated distortion-only lower bound for pruning
static inline i32 dist_floor(i32 qpd6, i32 dist) {
    i32 w1 = kWDist[qpd6];
    return (I32_MAX / w1 <= dist) ? I32_MAX : w1 * dist;
}

// default provider: computes candidates on the host CPU
struct LocalMathProvider final : MathProvider {
    NodeMathRefs node(EncState& st, i32 y, i32 x, i32 sz,
                      bool bll, bool blb, bool baa, bool bar,
                      const NodeMeta&) override {
        static thread_local NodeMath M;
        node_math(st, y, x, sz, bll, blb, baa, bar, M);
        return {M.quant, M.recon, M.sse, M.quant4, M.recon4, M.sse4,
                nullptr, nullptr};
    }
    PuMathRefs pu(EncState& st, i32 py, i32 px,
                  bool bll, bool blb, bool baa, bool bar) override {
        static thread_local i32 q[MODES][16];
        static thread_local u8 r[MODES][16];
        static thread_local i32 s[MODES];
        i32 top[1 + 2 * CTU], left[2 * CTU];
        ctx_slices(st, py, px, 4, top, left);
        Borders B;
        build_borders(4, top, left, bll, blb, baa, bar, B);
        u8 sorig[16];
        for (i32 i = 0; i < 4; i++)
            for (i32 j = 0; j < 4; j++) sorig[i * 4 + j] = st.og(py + i, px + j);
        for (i32 pm = 0; pm < MODES; pm++)
            s[pm] = candidate(st.qpd6, 4, B, pm, sorig, 4, q[pm], r[pm]);
        return {&q[0][0], &r[0][0], s, nullptr};
    }
};

// direct-mapped, exact-key-verified memo of fresh-coder 4x4 putCoef rates
// (the step-4 PU rate is a pure function of (qpd6, scan type, quant block),
// reference src/HEVCe.c:1505-1519)
struct PuRateCache {
    static constexpr i32 N = 1 << 14;
    i32 blk[N][16];
    i32 stype[N];
    i32 val[N];
    i32 qtag = -1;
};

static void process_cu(EncState& st, i32 y, i32 x, i32 sz,
                       bool bll, bool blb, bool baa, bool bar) {
    const i32 q = st.qpd6;
    const CabacEnc o_enc = st.enc;
    const CtxSet o_ctxs = st.ctxs;
    const size_t o_arena = st.arena.size();
    const i64 o_len = o_enc.bit_len();

    const i32 mr = st.mrow(y), mc = 1 + x / 4;
    const bool gl = sz > st.mcu(mr, mc - 1);
    const bool ga = sz > st.mcu(mr - 1, mc);
    const i32 pml = st.mpm(mr, mc - 1);
    const i32 pma = st.mpm(mr - 1, mc);
    const i32 ntu = sz / 4;

    u8 orig[CTU * CTU];
    for (i32 i = 0; i < sz; i++)
        for (i32 j = 0; j < sz; j++) orig[i * sz + j] = st.og(y + i, x + j);

    i32 best = I32_MAX;
    u8 best_rcon[CTU * CTU];
    std::vector<u8> best_bytes;   // winner's appended bytes beyond o_arena
    CabacEnc best_enc = o_enc;
    CtxSet best_ctxs = o_ctxs;
    bool have_best = false;

    auto sse_vs_plane = [&]() {
        i32 s = 0;
        for (i32 i = 0; i < sz; i++)
            for (i32 j = 0; j < sz; j++) {
                i32 d = (i32)orig[i * sz + j] - st.rcon[(size_t)(y + i) * st.xszn + x + j];
                s += d * d;
            }
        return s;
    };

    // ---- step 1: split (runs live; children append to arena) ----
    if (sz > MIN_CU) {
        put_split_cu(st.enc, st.ctxs, sz, 1, gl, ga);
        bool sf[4][4];
        sub_flags(bll, blb, baa, bar, sf);
        i32 h = sz / 2;
        for (int isub = 0; isub < 4; isub++)
            process_cu(st, y + kSubOff[isub][0] * h, x + kSubOff[isub][1] * h, h,
                       sf[isub][0], sf[isub][1], sf[isub][2], sf[isub][3]);
        best = rd_cost(q, sse_vs_plane(), (i32)(st.enc.bit_len() - o_len));
        for (i32 i = 0; i < sz; i++)
            std::memcpy(best_rcon + i * sz, &st.rcon[(size_t)(y + i) * st.xszn + x], sz);
        best_bytes.assign(st.arena.begin() + o_arena, st.arena.end());
        best_enc = st.enc;
        best_ctxs = st.ctxs;
        have_best = true;
        // roll the live coder back to the fork point; the incumbent is kept
        // aside and restored if no later candidate wins
        st.arena.resize(o_arena);
        st.enc = o_enc;
        st.ctxs = o_ctxs;
    }

    // ---- math + trial rates for steps 2+3 (device engine on the batched path) ----
    const NodeMeta meta{pml, pma, gl, ga};
    const NodeMathRefs M = st.mp->node(st, y, x, sz, bll, blb, baa, bar, meta);
    const i32 nn = sz * sz, hh = nn / 4;

    // evaluate the 70 candidates in reference order; device-supplied rates
    // short-circuit the host trial encode, and the winner is replayed ONCE
    // at the end (equivalent to the reference's commit-on-improve because
    // ties commit the later candidate: the final winner is the last index
    // attaining the running minimum).
    // bit budget beyond which a trial provably loses: rd_cost is monotone in
    // bits, so cost <= best requires w_bits*bits <= best - w_dist*sse
    auto bit_budget = [&](i32 sse, i32 running_best) -> i64 {
        i32 c1 = dist_floor(q, sse);
        if (c1 > running_best) return -1;
        return (i64)(running_best - c1) / kWBits[q];
    };
    auto host_trial2 = [&](i32 pm, i64 budget) -> i32 {
        st.enc = o_enc;
        st.ctxs = o_ctxs;
        st.enc.arena = nullptr;                 // count-only sink for trials
        st.enc.abort_len = o_len + budget;
        put_split_cu(st.enc, st.ctxs, sz, 0, gl, ga);
        put_cu_2nx2n(st.enc, st.ctxs, sz, pm, pml, pma, M.quant + pm * nn);
        i64 bits = st.enc.bit_len() - o_len;
        return bits > budget ? I32_MAX : (i32)bits;   // aborted/over: loses
    };
    auto host_trial3 = [&](i32 pm, i64 budget) -> i32 {
        st.enc = o_enc;
        st.ctxs = o_ctxs;
        st.enc.arena = nullptr;
        st.enc.abort_len = o_len + budget;
        put_split_cu(st.enc, st.ctxs, sz, 0, gl, ga);
        const i32* q4pm = M.quant4 + (size_t)pm * 4 * hh;
        const i32* subs[4] = {q4pm, q4pm + hh, q4pm + 2 * hh, q4pm + 3 * hh};
        put_cu_tusplit(st.enc, st.ctxs, sz, pm, pml, pma, subs);
        i64 bits = st.enc.bit_len() - o_len;
        return bits > budget ? I32_MAX : (i32)bits;
    };

    // Evaluate the 70 candidates by ASCENDING distortion floor so the running
    // best tightens early and the bit-budget abort prunes most later trials
    // after their first coefficient group. Decision-equivalent to reference
    // order: costs are order-independent; the winner is the candidate with
    // min cost and, among ties, the LARGEST reference index (ties commit the
    // later candidate, reference src/HEVCe.c:1440). A trial is only skipped
    // (budget < 0) or aborted (bits > budget) when cost > best is provable,
    // which can never drop a tie-winner.
    // device-oracle hint for this node (see EncState::hints): the fast
    // mode's chosen candidate goes first in the trial order below
    const int8_t* hrec = nullptr;
    i32 hint_ref = -1;
    if (st.hints) {
        hrec = st.hints + (size_t)((y / CTU) * st.hint_cols + x / CTU) * 106;
        i32 yy = y & (CTU - 1), xx = x & (CTU - 1);
        int node;
        if (sz == 32) node = 20;
        else {
            i32 qi = ((yy >> 4) << 1) | (xx >> 4);
            node = (sz == 16) ? 16 + qi
                              : qi * 4 + ((((yy >> 3) & 1) << 1) | ((xx >> 3) & 1));
        }
        i32 hlay = hrec[node], hpm = hrec[21 + node];
        if (hpm >= 0 && hpm < MODES)
            hint_ref = hpm + (hlay == 2 ? MODES : 0);
        hrec += 42 + (sz == MIN_CU ? (size_t)node * 4 : 0);  // -> pm4 of this leaf
    }

    i32 win_step = 0, win_pm = -1;   // 0 = incumbent (step 1)
    {
        // two-phase providers: quant/recon are not resident yet. If every
        // candidate has a device rate, arbitration needs no block data at
        // all and only the winner is fetched; otherwise fetch everything up
        // front (host trials need the quant blocks).
        const bool two_phase = st.mp->deferred();
        bool fetched_full = false;
        if (two_phase) {
            bool need_full = false;
            for (i32 pm = 0; pm < MODES; pm++)
                if (!M.rates2 || !M.rates3 || M.rates2[pm] < 0 || M.rates3[pm] < 0)
                    need_full = true;
            if (need_full) {
                st.mp->fetch_node(-1);
                fetched_full = true;
            }
        }
        i32 order[2 * MODES];
        for (i32 i = 0; i < 2 * MODES; i++) order[i] = i;
        auto sse_of = [&](i32 i) {
            return i < MODES ? M.sse[i] : M.sse4[i - MODES];
        };
        std::sort(order, order + 2 * MODES, [&](i32 a, i32 b) {
            i32 sa = sse_of(a), sb = sse_of(b);
            return sa != sb ? sa < sb : a < b;
        });
        if (hint_ref >= 0)           // hinted candidate first (order-safe)
            for (i32 i = 1; i < 2 * MODES; i++)
                if (order[i] == hint_ref) {
                    std::rotate(order, order + i, order + i + 1);
                    break;
                }
        i32 win_ref = -1;            // reference index of the winner (-1 = step 1)
#if HEVCE_VEC_TRIALS
        // HEVCE_VEC=1 opts in to the 16-lane vector trial pricer. Measured
        // round 4 (Kodak 03): parity at qpd6=2, ~4% slower at qpd6=0 — the
        // op-stream generation re-walks the same analysis the scalar trial
        // already does, and scatter->gather ordering on the lane context
        // array serializes the vector steps (~158 cy/step). Kept as tested
        // infrastructure; see ROADMAP round-4 notes for the full analysis.
        static const bool use_vec = [] {
            const char* e = getenv("HEVCE_VEC");
            return e && e[0] == '1';
        }();
#endif
        auto take = [&](i32 ref, i32 sse, i32 bits) {
            // min cost, ties commit the LARGER reference index — exact in
            // ANY visit order, which is what lets trials run in waves
            i32 cost = rd_cost(q, sse, bits);
            if (cost < best || (cost == best && ref > win_ref)) {
                best = cost;
                win_ref = ref;
                win_step = ref < MODES ? 2 : 3;
                win_pm = ref < MODES ? ref : ref - MODES;
            }
        };
#if HEVCE_VEC_TRIALS
        // host trials run in waves of up to 16 lanes: record each trial's
        // state-independent op stream, then price the wave with the exact
        // vector coder. Wave members carry the budget from assembly time —
        // staler (larger) than the sequential path's, which only means
        // EXTRA exact evaluations, never a different accept/reject (the
        // cost compare itself is exact and order-independent).
        constexpr i32 VCAP = 8192;
        // 512 KB wave op buffer, allocated per worker thread on first vec
        // use only — the default scalar path never touches it (ADVICE r4)
        static thread_local std::unique_ptr<u32[]> gops_buf;
        if (use_vec && !gops_buf) gops_buf.reset(new u32[16 * VCAP]);
        u32* const gops = gops_buf.get();
        i32 wref[16], wlen[16], wsse[16], wc1[16];
        uint64_t touched[(NUM_CTX + 63) / 64] = {};
        i32 nwave = 0;
        auto flush_wave = [&]() {
            if (nwave == 0) return;
            i32 outb[16];
#ifdef HEVCE_VEC_STATS
            g_waves++;
            g_lanes += nwave;
            i64 vc0 = (i64)__rdtsc();
#endif
            vec_trial_bits(o_enc, o_ctxs, gops, VCAP, wlen, nwave,
                           q, kWBits[q], best, wsse, wc1, touched, outb);
#ifdef HEVCE_VEC_STATS
            g_vec_cycles += (i64)__rdtsc() - vc0;
#endif
            for (i32 w = 0; w < nwave; w++)
                if (outb[w] != I32_MAX)
                    take(wref[w], wsse[w], outb[w]);
            nwave = 0;
            std::memset(touched, 0, sizeof touched);
        };
#endif
        for (i32 k = 0; k < 2 * MODES; k++) {
            const i32 ref = order[k];
            const int step = ref < MODES ? 2 : 3;
            const i32 pm = ref < MODES ? ref : ref - MODES;
            const i32 sse = sse_of(ref);
            const i32* rates = (step == 2) ? M.rates2 : M.rates3;
            i64 budget = bit_budget(sse, best);
            if (budget < 0) continue;                      // provably loses
            const bool dev_rate = rates && rates[pm] >= 0;
            if (!dev_rate) {
                // bypass-bit floor over the candidate's quant block(s): the
                // trial's bits are >= this for ANY live coder state (sign +
                // escape bins are bypass = exactly 1 bit each; context bins
                // >= 0), so floor > budget proves cost > best — skip the
                // whole trial encode. quant4's 4 sub-TUs are contiguous.
                const i32* qb = (step == 2) ? M.quant + pm * nn
                                            : M.quant4 + (size_t)pm * 4 * hh;
                if (rate_floor(qb, nn) > budget) continue;
#if HEVCE_VEC_TRIALS
                // the first surviving candidate runs scalar when there is
                // no incumbent yet (8x8 nodes have no step-1 split): its
                // cost seeds `best` so the wave's budgets have teeth
                if (use_vec && best != I32_MAX) {
#ifdef HEVCE_VEC_STATS
                    i64 gc0 = (i64)__rdtsc();
#endif
                    OpRecorder rec{&gops[(size_t)nwave * VCAP], VCAP, touched};
                    rec.abort_len = budget;
                    put_split_cu(rec, st.ctxs, sz, 0, gl, ga);
                    if (step == 2) {
                        put_cu_2nx2n(rec, st.ctxs, sz, pm, pml, pma, M.quant + pm * nn);
                    } else {
                        const i32* q4pm = M.quant4 + (size_t)pm * 4 * hh;
                        const i32* subs[4] = {q4pm, q4pm + hh, q4pm + 2 * hh, q4pm + 3 * hh};
                        put_cu_tusplit(rec, st.ctxs, sz, pm, pml, pma, subs);
                    }
#ifdef HEVCE_VEC_STATS
                    g_gen_cycles += (i64)__rdtsc() - gc0;
                    g_gen_ops += rec.n;
#endif
                    if (!rec.overflow) {
                        wref[nwave] = ref;
                        wsse[nwave] = sse;
                        wc1[nwave] = dist_floor(q, sse);
                        wlen[nwave] = rec.n;
                        if (++nwave == 16) flush_wave();
                        continue;
                    }
                    // cap overflow (can't happen for in-range coefficients;
                    // defensive): fall through to the scalar trial
                }
#endif
            }
#ifdef HEVCE_VEC_STATS
            if (!dev_rate) g_scalar_trials++;
#endif
            i32 bits = dev_rate ? rates[pm]
                       : (step == 2 ? host_trial2(pm, budget)
                                    : host_trial3(pm, budget));
            if (bits == I32_MAX) continue;                 // over budget: loses
            take(ref, sse, bits);
        }
#if HEVCE_VEC_TRIALS
        flush_wave();
#endif
        if (two_phase && !fetched_full)
            st.mp->fetch_node(win_step == 0 ? -2
                              : (win_step - 2) * MODES + win_pm);
    }
    if (win_step != 0) {
        // replay the winning candidate to materialize coder state + bytes
        i32 pm = win_pm;
        st.enc = o_enc;
        st.ctxs = o_ctxs;
        put_split_cu(st.enc, st.ctxs, sz, 0, gl, ga);
        if (win_step == 2) {
            put_cu_2nx2n(st.enc, st.ctxs, sz, pm, pml, pma, M.quant + pm * nn);
            std::memcpy(best_rcon, M.recon + pm * nn, (size_t)nn);
        } else {
            const i32* q4pm = M.quant4 + (size_t)pm * 4 * hh;
            const i32* subs[4] = {q4pm, q4pm + hh, q4pm + 2 * hh, q4pm + 3 * hh};
            put_cu_tusplit(st.enc, st.ctxs, sz, pm, pml, pma, subs);
            std::memcpy(best_rcon, M.recon4 + pm * nn, (size_t)nn);
        }
        best_bytes.assign(st.arena.begin() + o_arena, st.arena.end());
        best_enc = st.enc;
        best_ctxs = st.ctxs;
        have_best = true;
        st.arena.resize(o_arena);
        for (i32 r = 0; r < ntu; r++) {
            std::memset(&st.mcu(mr + r, mc), sz, ntu);
            std::memset(&st.mpm(mr + r, mc), pm, ntu);
        }
    }

    // ---- step 4: NxN (8x8 only) ----
    if (sz == MIN_CU) {
        i32 h = sz / 2;
        bool sf[4][4];
        sub_flags(bll, blb, baa, bar, sf);
        i32 sub_pm[4] = {0, 0, 0, 0};
        static thread_local i32 sub_q[4][16];
        // The step-4 PU rate is a FRESH-coder putCoef length (reference
        // src/HEVCe.c:1505-1519) — a pure function of (qpd6, scan type,
        // quant block), so it is memoizable. All-zero blocks (extremely
        // common at high qpd6) all share one constant rate; nonzero 4x4
        // blocks go through a small per-thread hash cache.
        static thread_local i32 zero_rate_q = -1, zero_rate_v = 0;
        if (zero_rate_q != q) {
            CabacEnc ne;
            CtxSet nc;
            nc.init(q);
            const i32 zb[16] = {};
            put_coef(ne, nc, 4, false, 0, zb);
            zero_rate_v = (i32)ne.bit_len();
            zero_rate_q = q;
        }
        static thread_local PuRateCache rcache;
        if (rcache.qtag != q) {
            std::memset(rcache.stype, -1, sizeof rcache.stype);
            rcache.qtag = q;
        }
        for (int isub = 0; isub < 4; isub++) {
            i32 py = y + kSubOff[isub][0] * h, px = x + kSubOff[isub][1] * h;
            const PuMathRefs P = st.mp->pu(st, py, px, sf[isub][0], sf[isub][1],
                                           sf[isub][2], sf[isub][3]);
            const bool two_phase = st.mp->deferred();
            bool fetched_full = !two_phase;
            if (two_phase) {
                bool need_full = false;
                for (i32 pm = 0; pm < MODES; pm++)
                    if (!P.rates || P.rates[pm] < 0) need_full = true;
                if (need_full) {
                    st.mp->fetch_pu(-1);
                    fetched_full = true;
                }
            }
            i32 sub_best = I32_MAX;
            // fresh-coder rate approximation per candidate (src/HEVCe.c:1505-1519);
            // device-supplied rates short-circuit the host trial encode.
            // Modes are visited by ASCENDING SSE so the dist-floor/budget
            // prunes bite early; decision-equivalent to reference order
            // because the fresh-coder rate is order-independent (pure
            // function of the block) and ties pick the LARGEST mode index
            // (sub_best >= cost commits the later candidate).
            i32 order[MODES];
            for (i32 i = 0; i < MODES; i++) order[i] = i;
            std::sort(order, order + MODES, [&](i32 a, i32 b) {
                return P.sse[a] != P.sse[b] ? P.sse[a] < P.sse[b] : a < b;
            });
            if (hrec && hrec[isub] >= 0 && hrec[isub] < MODES)
                for (i32 i = 1; i < MODES; i++)   // hinted PU mode first
                    if (order[i] == hrec[isub]) {
                        std::rotate(order, order + i, order + i + 1);
                        break;
                    }
            i32 win_pm_ref = -1;   // mode index of the winner (tie: largest)
            for (i32 k = 0; k < MODES; k++) {
                const i32 pm = order[k];
                i32 sse = P.sse[pm];
                i32 c1f = dist_floor(q, sse);
                if (c1f > sub_best) continue;
                i64 budget = (i64)(sub_best - c1f) / kWBits[q];
                i32 rate = P.rates ? P.rates[pm] : -1;
                const i32* blk = P.quant + pm * 16;    // valid iff fetched_full
                if (rate < 0 && !block_nonzero(blk, 16)) rate = zero_rate_v;
                if (rate < 0) {
                    const uint16_t* scan_dummy;
                    int stype = scan_select(4, pm, &scan_dummy);
                    uint64_t hh2 = 0xcbf29ce484222325ull ^ (uint64_t)stype;
                    for (int i = 0; i < 16; i++) {
                        hh2 ^= (uint32_t)blk[i];
                        hh2 *= 0x100000001b3ull;
                    }
                    i32 slot = (i32)(hh2 >> 16) & (PuRateCache::N - 1);
                    if (rcache.stype[slot] == stype &&
                        std::memcmp(rcache.blk[slot], blk, 64) == 0) {
                        rate = rcache.val[slot];
                    } else if (rate_floor(blk, 16) > budget) {
                        continue;   // fresh rate >= floor > budget: loses
                    } else {
                        CabacEnc ne;             // count-only sink (rate trial)
                        CtxSet nc;
                        nc.init(q);
                        put_coef(ne, nc, h, false, pm, blk);
                        rate = (i32)ne.bit_len();
                        std::memcpy(rcache.blk[slot], blk, 64);
                        rcache.stype[slot] = stype;
                        rcache.val[slot] = rate;
                    }
                }
                if (rate > budget) {
                    continue;
                }
                i32 cost = rd_cost(q, sse, rate);
                if (cost < sub_best || (cost == sub_best && pm > win_pm_ref)) {
                    sub_best = cost;
                    win_pm_ref = pm;
                }
            }
            // cannot-all-prune invariant: the first SSE-ordered mode always
            // survives (initial budget ~(I32_MAX - c1f)/w_bits exceeds any
            // 4x4 rate), so a winner always exists (round-2 advisor note)
            assert(win_pm_ref >= 0);
            sub_pm[isub] = win_pm_ref;
            if (two_phase && !fetched_full) {
                // fetch the winning PU's blocks before committing them
                st.mp->fetch_pu(sub_pm[isub]);
            }
            {
                i32 pm = sub_pm[isub];
                std::memcpy(sub_q[isub], P.quant + pm * 16, 16 * sizeof(i32));
                for (i32 i = 0; i < h; i++)
                    std::memcpy(&st.rcon[(size_t)(py + i) * st.xszn + px],
                                P.recon + pm * 16 + i * h, h);
            }
        }
        i32 pls[4] = {pml, sub_pm[0], st.mpm(st.mrow(y + h), 1 + x / 4 - 1), sub_pm[2]};
        i32 pas[4] = {pma, st.mpm(st.mrow(y) - 1, 1 + (x + h) / 4), sub_pm[0], sub_pm[1]};
        st.enc = o_enc;
        st.ctxs = o_ctxs;
        put_split_cu(st.enc, st.ctxs, sz, 0, gl, ga);
        const i32* subs[4] = {sub_q[0], sub_q[1], sub_q[2], sub_q[3]};
        put_cu_nxn(st.enc, st.ctxs, sz, sub_pm, pls, pas, subs);
        i32 cost = rd_cost(q, sse_vs_plane(), (i32)(st.enc.bit_len() - o_len));
        if (best >= cost) {
            // winner: PU recons already in the plane; coder state is live
            for (i32 r = 0; r < ntu; r++) std::memset(&st.mcu(mr + r, mc), sz, ntu);
            st.mpm(st.mrow(y), 1 + x / 4) = (u8)sub_pm[0];
            st.mpm(st.mrow(y), 1 + (x + h) / 4) = (u8)sub_pm[1];
            st.mpm(st.mrow(y + h), 1 + x / 4) = (u8)sub_pm[2];
            st.mpm(st.mrow(y + h), 1 + (x + h) / 4) = (u8)sub_pm[3];
            return;
        }
        st.arena.resize(o_arena);
    }

    // restore winner coder state + bytes + recon
    st.enc = best_enc;
    st.ctxs = best_ctxs;
    st.arena.insert(st.arena.end(), best_bytes.begin(), best_bytes.end());
    (void)have_best;
    for (i32 i = 0; i < sz; i++)
        std::memcpy(&st.rcon[(size_t)(y + i) * st.xszn + x], best_rcon + i * sz, sz);
}

// ---------------------------------------------------------------------------
// headers + top-level encode (reference src/HEVCe.c:621-691, :1566-1647)
// ---------------------------------------------------------------------------

struct BitWriter {
    std::vector<u8>& out;
    i32 acc = 0, nacc = 0;
    explicit BitWriter(std::vector<u8>& o) : out(o) {}
    void bits(i32 v, i32 len) {
        for (i32 i = len - 1; i >= 0; i--) {
            acc = (acc << 1) | ((v >> i) & 1);
            if (++nacc == 8) { out.push_back((u8)acc); acc = 0; nacc = 0; }
        }
    }
    void uvlc(i32 value) {
        i32 v = value + 1, half = 0;
        for (i32 t = v + 1; t > 1; t >>= 1) half++;
        bits(0, half);
        bits(v & ((1 << (half + 1)) - 1), half + 1);
    }
    void align() { while (nacc) bits(0, 1); }
};

static void write_headers(std::vector<u8>& out, i32 qpd6, i32 ysz, i32 xsz) {
    static const u8 vps[] = {0x00, 0x00, 0x01, 0x40, 0x01, 0x0C, 0x01, 0xFF, 0xFF, 0x03,
                             0x10, 0x00, 0x00, 0x03, 0x00, 0x00, 0x03, 0x00, 0x00, 0x03,
                             0x00, 0x00, 0x03, 0x00, 0xB4, 0xF0, 0x24};
    static const u8 sps[] = {0x00, 0x00, 0x01, 0x42, 0x01, 0x01, 0x03, 0x10, 0x00, 0x00,
                             0x03, 0x00, 0x00, 0x03, 0x00, 0x00, 0x03, 0x00, 0x00, 0x03,
                             0x00, 0xB4};
    static const u8 pps[] = {0x00, 0x00, 0x01, 0x44, 0x01, 0xC0, 0x90, 0x91, 0x81, 0xD9, 0x20};
    static const u8 slice[5][8] = {
        {0x00, 0x00, 0x01, 0x26, 0x01, 0xAC, 0x16, 0xDE},
        {0x00, 0x00, 0x01, 0x26, 0x01, 0xAC, 0x10, 0xDE},
        {0x00, 0x00, 0x01, 0x26, 0x01, 0xAC, 0x2B, 0x78},
        {0x00, 0x00, 0x01, 0x26, 0x01, 0xAC, 0x4D, 0xE0},
        {0x00, 0x00, 0x01, 0x26, 0x01, 0xAC, 0x97, 0x80}};
    out.insert(out.end(), vps, vps + sizeof vps);
    out.insert(out.end(), sps, sps + sizeof sps);
    BitWriter bw(out);
    bw.bits(0x0A, 4);
    bw.uvlc(xsz);
    bw.uvlc(ysz);
    bw.bits(0x197EE4, 22);
    bw.bits(0x681ED1, 24);  // max_transform_hierarchy_depth_intra = 1
    bw.align();
    out.insert(out.end(), pps, pps + sizeof pps);
    out.insert(out.end(), slice[qpd6], slice[qpd6] + 8);
}

static i64 encode(const u8* img, i32* ysz, i32* xsz, i32 qpd6, u8* stream, u8* rcon_out,
                  MathProvider* mp = nullptr, size_t stream_cap = 0,
                  const int8_t* hints = nullptr) {
    LocalMathProvider local;
    EncState st;
    st.mp = mp ? mp : &local;
    st.hints = hints;
    st.qpd6 = qpd6;
    st.ysz0 = *ysz < 8192 ? *ysz : 8192;
    st.xsz0 = *xsz < 8192 ? *xsz : 8192;
    st.yszn = (st.ysz0 + CTU - 1) / CTU * CTU;
    st.xszn = (st.xsz0 + CTU - 1) / CTU * CTU;
    st.img = img;
    st.rcon.assign((size_t)st.yszn * st.xszn, 0);
    st.map_w = 1 + st.xszn / 4;
    st.map_cu_sz.assign((size_t)9 * st.map_w, CTU);
    st.map_pmode.assign((size_t)9 * st.map_w, 1);  // DC
    st.hint_cols = st.xszn / CTU;
    st.ctxs.init(qpd6);
    st.arena.reserve(1 << 20);
    st.enc.arena = &st.arena;

    std::vector<u8> out;
    out.reserve((size_t)st.yszn * st.xszn);
    write_headers(out, qpd6, st.yszn, st.xszn);

    for (i32 y = 0; y < st.yszn; y += CTU) {
        st.ctu_y = y;
        for (i32 x = 0; x < st.xszn; x += CTU) {
            bool bll = x > 0, baa = y > 0;
            bool bar = baa && (x + CTU < st.xszn);
            process_cu(st, y, x, CTU, bll, false, baa, bar);
            bool last = (y + CTU >= st.yszn) && (x + CTU >= st.xszn);
            st.enc.terminate(last);
            out.insert(out.end(), st.arena.begin(), st.arena.end());
            st.arena.clear();
        }
        // scroll cu-size line buffer only (above-CTU pmode stays DC)
        std::memcpy(&st.mcu(0, 1), &st.mcu(8, 1), st.map_w - 1);
    }
    st.enc.finish();
    out.insert(out.end(), st.arena.begin(), st.arena.end());

    if (stream_cap && out.size() > stream_cap) return -2;  // caller buffer too small
    std::memcpy(stream, out.data(), out.size());
    for (i32 i = 0; i < st.yszn; i++)
        std::memcpy(rcon_out + (size_t)i * st.xszn, &st.rcon[(size_t)i * st.xszn], st.xszn);
    *ysz = st.yszn;
    *xsz = st.xszn;
    return (i64)out.size();
}

// ---------------------------------------------------------------------------
// Wavefront fast-mode packer: emit an exact, standard-compliant stream for a
// PRE-DECIDED CU forest (decisions from the device-side greedy wavefront
// search, hevce_tpu/models/wavefront.py). The entropy path here is the same
// exact CABAC machinery the bit-exact encoder uses; only the DECISIONS differ
// from the reference RDO (a documented non-bit-exact serving mode — the
// bit-exact path stays the default everywhere).
//
// Per-CTU record, z-order node indexing: 8x8 leaves idx = q*4 + l (q = the
// 16-quad z index, l = leaf z index within it), 16-nodes idx 16+q, the 32
// root idx 20. lay[node]: 0 = split (16/32 nodes only), 1 = 2Nx2N single TU,
// 2 = 2Nx2N TU-split (quant holds the 4 sub-TUs concatenated, z order).
// qc is the CTU's quant levels COMPOSED over the chosen forest in z-order
// leaf concatenation (1024 entries): a 32-leaf occupies [0,1024); 16-quadrant
// qi occupies [qi*256, qi*256+256); 8-leaf (qi,li) occupies [qi*256+li*64,
// +64). The leaves partition the CTU, so the composed form is 3x smaller
// than shipping every node's winner — it is what the device fast path
// transfers (models/wavefront.py composes it on device before fetch).
struct PackRec {
    const i32* lay;   // 21
    const i32* pm;    // 21
    const i32* pm4;   // 64: per-8x8-leaf NxN PU modes, leaf*4 + pu (lay==3 only)
    const i32* qc;    // 1024 composed; nullptr -> recompute from decisions
};

// Decision replay: recompute one non-split CU's quant levels + recon from the
// device-chosen (lay, pmode[s]) alone. The candidate pipeline (predict ->
// fwd transform -> RDOQ quantize -> recon) is deterministic integer math and
// bit-identical between the device fast mode and this host engine (both are
// golden-validated against the same vectors), so the recomputed levels equal
// the ones the device composed — which lets the fast mode fetch only the
// ~106 B/CTU decision records instead of the 1 KB/CTU quant planes (the
// device->host transfer was the fast path's dominant cost on tunneled TPUs).
// Commits the recon into st.rcon exactly like the bit-exact encoder does.
static void replay_cu(EncState& st, i32 y, i32 x, i32 sz, i32 lay,
                      const i32* pms, bool bll, bool blb, bool baa, bool bar,
                      i32* qout) {
    i32 top[1 + 2 * CTU], left[2 * CTU];
    if (lay == 3) {
        // NxN: four 4x4 PUs chained through the committed plane (the device
        // commits each PU's recon into its canvas before the next PU's
        // borders are read — reference step-4 semantics, src/HEVCe.c:1539-1556)
        const i32 h = sz / 2;
        bool sf[4][4];
        sub_flags(bll, blb, baa, bar, sf);
        for (int isub = 0; isub < 4; isub++) {
            i32 py = y + kSubOff[isub][0] * h, px = x + kSubOff[isub][1] * h;
            ctx_slices(st, py, px, 4, top, left);
            Borders B;
            build_borders(4, top, left, sf[isub][0], sf[isub][1], sf[isub][2],
                          sf[isub][3], B);
            u8 sorig[16], srecon[16];
            for (i32 i = 0; i < 4; i++)
                for (i32 j = 0; j < 4; j++) sorig[i * 4 + j] = st.og(py + i, px + j);
            candidate(st.qpd6, 4, B, pms[isub], sorig, 4, qout + isub * 16, srecon);
            for (i32 i = 0; i < 4; i++)
                std::memcpy(&st.rcon[(size_t)(py + i) * st.xszn + px],
                            srecon + i * 4, 4);
        }
        return;
    }
    u8 orig[CTU * CTU], recon[CTU * CTU];
    for (i32 i = 0; i < sz; i++)
        for (i32 j = 0; j < sz; j++) orig[i * sz + j] = st.og(y + i, x + j);
    ctx_slices(st, y, x, sz, top, left);
    if (lay == 1) {
        Borders B;
        build_borders(sz, top, left, bll, blb, baa, bar, B);
        candidate(st.qpd6, sz, B, pms[0], orig, sz, qout, recon);
    } else {  // lay == 2: chained sub-TUs, same helper node_math uses
        bool sf[4][4];
        sub_flags(bll, blb, baa, bar, sf);
        tusplit_mode(st.qpd6, sz, top, left, sf, pms[0], orig, qout, recon);
    }
    for (i32 i = 0; i < sz; i++)
        std::memcpy(&st.rcon[(size_t)(y + i) * st.xszn + x], recon + i * sz, sz);
}

// Per-node exact-bit accounting for the fast-mode rate-model diagnosis
// (VERDICT r4 item 3): when enabled, every packed non-split CU appends
// [y, x, sz, lay, pm, exact_bits] int32 records here; pack_stream dumps
// them to the HEVCE_PACK_STATS path. Diagnostic only — zero cost when off.
static thread_local std::vector<i32>* g_pack_stats = nullptr;
// last pack_stream's realized CABAC stats (bits / ctx bins / bypass bins)
static thread_local i64 g_last_pack_bits = 0;
static thread_local i64 g_last_pack_nctx = 0;
static thread_local i64 g_last_pack_nbyp = 0;

static void pack_cu(EncState& st, const PackRec& rec, i32 y, i32 x, i32 sz, int node,
                    bool bll, bool blb, bool baa, bool bar) {
    const i32 mr = st.mrow(y), mc = 1 + x / 4;
    const bool gl = sz > st.mcu(mr, mc - 1);
    const bool ga = sz > st.mcu(mr - 1, mc);
    const i32 pml = st.mpm(mr, mc - 1);
    const i32 pma = st.mpm(mr - 1, mc);
    if (sz > MIN_CU && rec.lay[node] == 0) {
        put_split_cu(st.enc, st.ctxs, sz, 1, gl, ga);
        i32 h = sz / 2;
        bool sf[4][4];
        sub_flags(bll, blb, baa, bar, sf);
        for (int i = 0; i < 4; i++) {
            int child = (sz == CTU) ? 16 + i : (node - 16) * 4 + i;
            pack_cu(st, rec, y + kSubOff[i][0] * h, x + kSubOff[i][1] * h, h,
                    child, sf[i][0], sf[i][1], sf[i][2], sf[i][3]);
        }
        return;
    }
    const i32 pm = rec.pm[node];
    i32 qbuf[CTU * CTU];
    const i32* qb;
    if (rec.qc) {
        qb = rec.qc + (sz == CTU ? 0
                       : sz == 16 ? (size_t)(node - 16) * 256
                                  : (size_t)(node >> 2) * 256
                                        + (size_t)(node & 3) * 64);
    } else {
        const i32 lay = rec.lay[node];
        replay_cu(st, y, x, sz, lay,
                  lay == 3 ? rec.pm4 + (size_t)node * 4 : rec.pm + node,
                  bll, blb, baa, bar, qbuf);
        qb = qbuf;
    }
    const i64 pb0 = g_pack_stats ? st.enc.bit_len() : 0;
    auto push_stats = [&](i32 layv, i32 pmv) {
        if (!g_pack_stats) return;
        const i32 d = (i32)(st.enc.bit_len() - pb0);
        const i32 r6[6] = {y, x, sz, layv, pmv, d};
        g_pack_stats->insert(g_pack_stats->end(), r6, r6 + 6);
    };
    put_split_cu(st.enc, st.ctxs, sz, 0, gl, ga);
    const i32 ntu = sz / 4;
    if (rec.lay[node] == 3) {
        // NxN: four independent 4x4 PUs (8x8 leaves only). MPM neighbor
        // wiring and per-PU pmode map commits mirror the bit-exact engine's
        // step 4 (reference src/HEVCe.c:1531-1556).
        i32 h = sz / 2;
        const i32* pms = rec.pm4 + (size_t)node * 4;
        i32 pls[4] = {pml, pms[0], st.mpm(st.mrow(y + h), 1 + x / 4 - 1), pms[2]};
        i32 pas[4] = {pma, st.mpm(st.mrow(y) - 1, 1 + (x + h) / 4), pms[0], pms[1]};
        const i32* subs[4] = {qb, qb + 16, qb + 32, qb + 48};
        put_cu_nxn(st.enc, st.ctxs, sz, pms, pls, pas, subs);
        push_stats(3, pms[0]);
        for (i32 r = 0; r < ntu; r++) std::memset(&st.mcu(mr + r, mc), sz, ntu);
        st.mpm(st.mrow(y), 1 + x / 4) = (u8)pms[0];
        st.mpm(st.mrow(y), 1 + (x + h) / 4) = (u8)pms[1];
        st.mpm(st.mrow(y + h), 1 + x / 4) = (u8)pms[2];
        st.mpm(st.mrow(y + h), 1 + (x + h) / 4) = (u8)pms[3];
        return;
    }
    if (rec.lay[node] == 1) {
        put_cu_2nx2n(st.enc, st.ctxs, sz, pm, pml, pma, qb);
    } else {
        const i32 hh = (sz / 2) * (sz / 2);
        const i32* subs[4] = {qb, qb + hh, qb + 2 * hh, qb + 3 * hh};
        put_cu_tusplit(st.enc, st.ctxs, sz, pm, pml, pma, subs);
    }
    push_stats(rec.lay[node], pm);
    for (i32 r = 0; r < ntu; r++) {
        std::memset(&st.mcu(mr + r, mc), sz, ntu);
        std::memset(&st.mpm(mr + r, mc), pm, ntu);
    }
}

// qc == nullptr -> decision-replay mode: img must be the original (unpadded)
// pixels; quant levels are recomputed (replay_cu) and the recon plane is
// maintained; rcon_out (optional) receives the padded recon plane.
static i64 pack_stream(const i32* lay, const i32* pm, const i32* pm4,
                       const i32* qc, const u8* img,
                       i32 ysz, i32 xsz, i32 qpd6, u8* stream, i64 cap,
                       u8* rcon_out) {
    EncState st;
    st.qpd6 = qpd6;
    st.ysz0 = ysz;
    st.xsz0 = xsz;
    st.yszn = (ysz + CTU - 1) / CTU * CTU;
    st.xszn = (xsz + CTU - 1) / CTU * CTU;
    st.img = img;
    if (!qc)  // zeros match the device canvas's masked substitutions
        st.rcon.assign((size_t)st.yszn * st.xszn, 0);
    st.map_w = 1 + st.xszn / 4;
    st.map_cu_sz.assign((size_t)9 * st.map_w, CTU);
    st.map_pmode.assign((size_t)9 * st.map_w, 1);  // DC
    st.ctxs.init(qpd6);
    st.arena.reserve(1 << 20);
    st.enc.arena = &st.arena;

    std::vector<i32> stats;
    const char* stats_path = getenv("HEVCE_PACK_STATS");
    g_pack_stats = (stats_path && stats_path[0]) ? &stats : nullptr;

    std::vector<u8> out;
    write_headers(out, qpd6, st.yszn, st.xszn);
    const i32 R = st.yszn / CTU, Cc = st.xszn / CTU;
    for (i32 r = 0; r < R; r++) {
        st.ctu_y = r * CTU;
        for (i32 c = 0; c < Cc; c++) {
            const size_t k = (size_t)r * Cc + c;
            PackRec rec{lay + k * 21, pm + k * 21, pm4 + k * 64,
                        qc ? qc + k * 1024 : nullptr};
            // CTU-level availability mirrors the device wavefront's
            // structural rules (models/wavefront.py _make_front_core)
            pack_cu(st, rec, r * CTU, c * CTU, CTU, 20,
                    c > 0, false, r > 0, r > 0 && c + 1 < Cc);
            st.enc.terminate(r == R - 1 && c == Cc - 1);
            out.insert(out.end(), st.arena.begin(), st.arena.end());
            st.arena.clear();
        }
        // scroll cu-size line buffer only (above-CTU pmode stays DC)
        std::memcpy(&st.mcu(0, 1), &st.mcu(8, 1), st.map_w - 1);
    }
    st.enc.finish();
    out.insert(out.end(), st.arena.begin(), st.arena.end());
    // realized-rate feedback for the fast mode's sub-bit price model
    // (models/wavefront.py CTX_BIT): CABAC payload bits + bin counts of
    // THIS pack, readable via hevce_last_pack_stats (thread-local: each
    // worker packs its own images)
    g_last_pack_bits = 8 * st.enc.nbytes;
    g_last_pack_nctx = st.enc.nctx;
    g_last_pack_nbyp = st.enc.nbyp;
    if (g_pack_stats) {
        if (FILE* f = std::fopen(stats_path, "ab")) {
            // framed per image: [-1, R, Cc, qpd6, n_records, 0] then records
            const i32 hdr[6] = {-1, R, Cc, qpd6, (i32)(stats.size() / 6), 0};
            std::fwrite(hdr, sizeof(i32), 6, f);
            std::fwrite(stats.data(), sizeof(i32), stats.size(), f);
            std::fclose(f);
        }
        g_pack_stats = nullptr;
    }
    if (cap && (i64)out.size() > cap) return -2;
    std::memcpy(stream, out.data(), out.size());
    if (!qc && rcon_out)
        std::memcpy(rcon_out, st.rcon.data(), (size_t)st.yszn * st.xszn);
    return (i64)out.size();
}

// ---------------------------------------------------------------------------
// lockstep batch engine: B same-sized images encoded by B worker threads whose
// math requests rendezvous into one device batch per schedule event. The CU
// search schedule is content-independent (SURVEY.md §3: the same 21-node tree
// + 4 PU searches per 8x8 runs for every CTU), so all workers request the same
// (kind, size) at every step; the Python driver runs one jitted TPU step per
// event and writes results straight into the shared buffers.
// ---------------------------------------------------------------------------

struct BatchEngine {
    i32 B, qpd6, ysz, xsz, yszn, xszn;
    const u8* imgs;  // B contiguous (ysz, xsz) images

    // request buffers (slot-strided, max-size rows)
    std::vector<i32> req_top;    // B x 65
    std::vector<i32> req_left;   // B x 64
    std::vector<u8> req_flags;   // B x 4
    std::vector<i32> req_orig;   // B x 1024
    std::vector<i32> req_state;  // B x 7  fork coder state (node events)
    std::vector<i32> req_ctxs;   // B x 142 fork context vector
    std::vector<i32> req_meta;   // B x 4  pml, pma, gl, ga
    std::vector<i32> req_fetch;  // B      fetch selector (-2 none, -1 all,
                                 //        >=0 flat lane) for fetch events
    i32 ev_kind = -1, ev_sz = 0;  // 0=node, 1=pu, 2=done, 3=node fetch, 4=pu fetch

    // result buffers (compact per event: (B, 35, sz*sz) etc.)
    std::vector<i32> res_quant, res_sse, res_quant4, res_sse4, res_rates;
    std::vector<i32> res_rates2, res_rates3;
    std::vector<u8> res_recon, res_recon4;

    std::mutex m;
    std::condition_variable cv_master, cv_workers;
    i32 arrived = 0, alive = 0;
    bool aborted = false;   // driver died mid-event: free-run the workers so
                            // destroy() can join (results are discarded)
    uint64_t generation = 0;

    std::vector<std::vector<u8>> streams, rcons;
    std::vector<std::thread> threads;

    BatchEngine(const u8* imgs_, i32 B_, i32 ysz_, i32 xsz_, i32 qpd6_)
        : B(B_), qpd6(qpd6_), ysz(ysz_), xsz(xsz_), imgs(imgs_) {
        yszn = (ysz + CTU - 1) / CTU * CTU;
        xszn = (xsz + CTU - 1) / CTU * CTU;
        req_top.resize((size_t)B * 65);
        req_left.resize((size_t)B * 64);
        req_flags.resize((size_t)B * 4);
        req_orig.resize((size_t)B * CTU * CTU);
        res_quant.resize((size_t)B * MODES * CTU * CTU);
        res_recon.resize((size_t)B * MODES * CTU * CTU);
        res_sse.resize((size_t)B * MODES);
        res_quant4.resize((size_t)B * MODES * CTU * CTU);
        res_recon4.resize((size_t)B * MODES * CTU * CTU);
        res_sse4.resize((size_t)B * MODES);
        res_rates.assign((size_t)B * MODES, -1);
        req_state.resize((size_t)B * 7);
        req_ctxs.resize((size_t)B * NUM_CTX);
        req_meta.resize((size_t)B * 4);
        req_fetch.assign((size_t)B, -2);
        res_rates2.assign((size_t)B * MODES, -1);
        res_rates3.assign((size_t)B * MODES, -1);
        streams.resize(B);
        rcons.resize(B);
        alive = B;
    }

    // worker side: slot request filled; wait for device results
    void rendezvous(i32 kind, i32 sz) {
        std::unique_lock<std::mutex> lk(m);
        if (aborted) return;
        if (arrived == 0) { ev_kind = kind; ev_sz = sz; }
        arrived++;
        uint64_t gen = generation;
        if (arrived == alive) cv_master.notify_one();
        cv_workers.wait(lk, [&] { return generation != gen || aborted; });
    }

    void abort() {
        std::unique_lock<std::mutex> lk(m);
        aborted = true;
        generation++;
        cv_workers.notify_all();
    }

    void worker_done() {
        std::unique_lock<std::mutex> lk(m);
        alive--;
        if (alive == 0 || arrived == alive) cv_master.notify_one();
    }

    // master side
    int next(int* sz_out) {
        std::unique_lock<std::mutex> lk(m);
        cv_master.wait(lk, [&] { return alive == 0 || (alive > 0 && arrived == alive); });
        if (alive == 0) return 2;
        *sz_out = ev_sz;
        return ev_kind;
    }

    void supply() {
        std::unique_lock<std::mutex> lk(m);
        arrived = 0;
        generation++;
        cv_workers.notify_all();
    }
};

struct BatchMathProvider final : MathProvider {
    BatchEngine* be;
    i32 slot;
    i32 cur_sz = 0;    // sz of the node event a pending fetch belongs to
    BatchMathProvider(BatchEngine* b, i32 s) : be(b), slot(s) {}

    void fill_request(EncState& st, i32 y, i32 x, i32 sz,
                      bool bll, bool blb, bool baa, bool bar) {
        i32* top = be->req_top.data() + (size_t)slot * 65;
        i32* left = be->req_left.data() + (size_t)slot * 64;
        ctx_slices(st, y, x, sz, top, left);
        u8* fl = be->req_flags.data() + (size_t)slot * 4;
        fl[0] = bll; fl[1] = blb; fl[2] = baa; fl[3] = bar;
        i32* orig = be->req_orig.data() + (size_t)slot * CTU * CTU;
        for (i32 i = 0; i < sz; i++)
            for (i32 j = 0; j < sz; j++) orig[i * sz + j] = st.og(y + i, x + j);
    }

    NodeMathRefs node(EncState& st, i32 y, i32 x, i32 sz,
                      bool bll, bool blb, bool baa, bool bar,
                      const NodeMeta& meta) override {
        fill_request(st, y, x, sz, bll, blb, baa, bar);
        // fork state for device-side trial rates (st.enc == the fork point:
        // the arbiter rolls back to o_enc before requesting node math)
        i32* s = be->req_state.data() + (size_t)slot * 7;
        s[0] = st.enc.range; s[1] = st.enc.low; s[2] = st.enc.nbits;
        s[3] = st.enc.outstanding; s[4] = st.enc.bufbyte; s[5] = st.enc.zrun;
        s[6] = (i32)st.enc.nbytes;
        i32* c = be->req_ctxs.data() + (size_t)slot * NUM_CTX;
        for (int i = 0; i < NUM_CTX; i++) c[i] = st.ctxs.v[i];
        i32* m = be->req_meta.data() + (size_t)slot * 4;
        m[0] = meta.pml; m[1] = meta.pma; m[2] = meta.gl; m[3] = meta.ga;
        cur_sz = sz;
        be->rendezvous(0, sz);
        size_t nn = (size_t)sz * sz;
        return {be->res_quant.data() + slot * MODES * nn,
                be->res_recon.data() + slot * MODES * nn,
                be->res_sse.data() + (size_t)slot * MODES,
                be->res_quant4.data() + slot * MODES * nn,
                be->res_recon4.data() + slot * MODES * nn,
                be->res_sse4.data() + (size_t)slot * MODES,
                be->res_rates2.data() + (size_t)slot * MODES,
                be->res_rates3.data() + (size_t)slot * MODES};
    }

    bool deferred() const override { return true; }

    void fetch_node(i32 sel) override {
        be->req_fetch[slot] = sel;
        be->rendezvous(3, cur_sz);
    }

    void fetch_pu(i32 sel) override {
        be->req_fetch[slot] = sel;
        be->rendezvous(4, 4);
    }

    PuMathRefs pu(EncState& st, i32 py, i32 px,
                  bool bll, bool blb, bool baa, bool bar) override {
        fill_request(st, py, px, 4, bll, blb, baa, bar);
        be->rendezvous(1, 4);
        return {be->res_quant.data() + (size_t)slot * MODES * 16,
                be->res_recon.data() + (size_t)slot * MODES * 16,
                be->res_sse.data() + (size_t)slot * MODES,
                be->res_rates.data() + (size_t)slot * MODES};
    }
};

static void batch_worker(BatchEngine* be, i32 slot) {
    BatchMathProvider mp(be, slot);
    i32 y = be->ysz, x = be->xsz;
    std::vector<u8> stream(stream_capacity(be->yszn, be->xszn));
    std::vector<u8> rcon((size_t)be->yszn * be->xszn);
    i64 n = encode(be->imgs + (size_t)slot * be->ysz * be->xsz, &y, &x, be->qpd6,
                   stream.data(), rcon.data(), &mp, stream.size());
    stream.resize((size_t)n);
    be->streams[slot] = std::move(stream);
    be->rcons[slot] = std::move(rcon);
    be->worker_done();
}

// pure-native parallel batch encode: nthreads workers drain an image queue
// with local (host) math — the production throughput path on many-core hosts
// (this dev box has one core; see ROADMAP.md)
struct NativeBatch {
    const u8* imgs;
    i32 n, ysz, xsz, qpd6;
    const int8_t* hints = nullptr;   // optional, n * n_ctus * 106 (see EncState)
    std::vector<std::vector<u8>> streams, rcons;
    std::atomic<i32> next{0};
    void run(i32 slot) {
        i32 y = ysz, x = xsz;
        i32 yp = (ysz + CTU - 1) / CTU * CTU, xp = (xsz + CTU - 1) / CTU * CTU;
        std::vector<u8> stream(stream_capacity(yp, xp));
        std::vector<u8> rcon((size_t)yp * xp);
        size_t hstride = (size_t)(yp / CTU) * (xp / CTU) * 106;
        i64 len = encode(imgs + (size_t)slot * ysz * xsz, &y, &x, qpd6,
                         stream.data(), rcon.data(), nullptr, stream.size(),
                         hints ? hints + (size_t)slot * hstride : nullptr);
        stream.resize((size_t)len);
        streams[slot] = std::move(stream);
        rcons[slot] = std::move(rcon);
    }
};

static void native_batch_encode(NativeBatch& nb, i32 nthreads) {
    nb.streams.resize(nb.n);
    nb.rcons.resize(nb.n);
    auto worker = [&] {
        for (;;) {
            i32 slot = nb.next.fetch_add(1);
            if (slot >= nb.n) return;
            nb.run(slot);
        }
    };
    std::vector<std::thread> ts;
    for (i32 t = 0; t < nthreads; t++) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// Independent decoder (compliance verification; SURVEY.md §4 level 3 — the
// reference directs users to third-party decoders, /root/reference/README.md
// :21-22; none is installable here, so we implement the H.265 DECODING
// process for the stream subset this encoder emits: monochrome-content
// intra slice, CTU 32, no SAO/PCM/scaling-lists/sign-hiding/transform-skip).
//
// The entropy side is written in the DECODE direction against the spec
// (RBSP unescape, SPS/PPS/slice-header parsing, arithmetic decoder over
// offset/range, syntax parsing), so an encoder-side coder/syntax bug cannot
// cancel out; only the standard tables and the numeric reconstruction
// kernels (predict / dequantize / inverse transform) are shared.
//
// Note on deblocking: the emitted headers signal deblocking enabled with
// beta/tc offsets 0. HEVC intra prediction always uses UNfiltered samples,
// so for a single intra picture deblocking affects only the display output;
// this decoder returns the pre-deblocking reconstruction, which is exactly
// the encoder's img_rcon contract (the verification oracle).
// ---------------------------------------------------------------------------

namespace dec {

struct BitReader {
    std::vector<u8> buf;   // unescaped RBSP
    size_t bitpos = 0;
    bool fail = false;
    void load(const u8* p, size_t n) {
        buf.clear();
        buf.reserve(n);
        i32 zrun = 0;
        for (size_t i = 0; i < n; i++) {
            u8 b = p[i];
            if (zrun >= 2 && b == 0x03) { zrun = 0; continue; }  // emulation prevention
            buf.push_back(b);
            zrun = (b == 0) ? zrun + 1 : 0;
        }
    }
    i32 bit() {
        size_t byte = bitpos >> 3;
        if (byte >= buf.size()) { fail = true; return 0; }
        i32 v = (buf[byte] >> (7 - (bitpos & 7))) & 1;
        bitpos++;
        return v;
    }
    i32 bits(i32 n) {
        i32 v = 0;
        for (i32 i = 0; i < n; i++) v = (v << 1) | bit();
        return v;
    }
    i32 ue() {   // Exp-Golomb
        i32 z = 0;
        while (!fail && bit() == 0)
            if (++z > 31) { fail = true; return 0; }
        return ((1 << z) - 1) + (z ? bits(z) : 0);
    }
    i32 se() {
        i32 k = ue();
        return (k & 1) ? (k + 1) / 2 : -(k / 2);
    }
    void byte_align() { while (bitpos & 7) bitpos++; }
};

// arithmetic decoder (H.265 9.3.4.3) over the slice RBSP
struct CabacDec {
    const u8* p = nullptr;
    size_t n = 0, pos = 0;
    i32 nbit = 0;
    i32 range = 510, offset = 0;
    bool fail = false;

    i32 rbit() {
        if (pos >= n) { fail = true; return 0; }
        i32 v = (p[pos] >> (7 - nbit)) & 1;
        if (++nbit == 8) { nbit = 0; pos++; }
        return v;
    }
    void init(const u8* data, size_t len) {
        p = data; n = len; pos = 0; nbit = 0;
        range = 510;
        offset = 0;
        for (i32 i = 0; i < 9; i++) offset = (offset << 1) | rbit();
    }
    i32 bin(u8* ctx) {
        u8 v = *ctx;
        i32 lps = kLpsTable[v >> 1][(range >> 6) & 3];
        range -= lps;
        i32 b;
        if (offset >= range) {
            b = 1 - (v & 1);
            offset -= range;
            range = lps;
            *ctx = T.next_lps[v];
        } else {
            b = v & 1;
            *ctx = T.next_mps[v];
        }
        while (range < 256) { range <<= 1; offset = (offset << 1) | rbit(); }
        return b;
    }
    i32 bypass() {
        offset = (offset << 1) | rbit();
        if (offset >= range) { offset -= range; return 1; }
        return 0;
    }
    i32 bypass_bits(i32 len) {
        i32 v = 0;
        for (i32 i = 0; i < len; i++) v = (v << 1) | bypass();
        return v;
    }
    i32 terminate() {
        range -= 2;
        if (offset >= range) return 1;
        if (range < 256) { range <<= 1; offset = (offset << 1) | rbit(); }
        return 0;
    }
};

struct DecState {
    i32 qpd6 = 0, yszn = 0, xszn = 0;
    std::vector<u8> rcon;
    std::vector<u8> map_cu_sz, map_pmode;
    i32 map_w = 0, ctu_y = 0;
    CabacDec d;
    CtxSet ctxs;
    bool fail = false;

    inline u8 rc(i32 y, i32 x) const {
        y = iclip(y, 0, yszn - 1);
        x = iclip(x, 0, xszn - 1);
        return rcon[(size_t)y * xszn + x];
    }
    inline i32 mrow(i32 y) const { return 1 + (y - ctu_y) / 4; }
    inline u8& mcu(i32 r, i32 c) { return map_cu_sz[(size_t)r * map_w + c]; }
    inline u8& mpm(i32 r, i32 c) { return map_pmode[(size_t)r * map_w + c]; }
};

// coeff_abs_level_remaining, inverse of put_exgolomb
static i32 read_exgolomb(CabacDec& d, i32 rparam) {
    i32 k = 0;
    while (!d.fail && d.bypass())
        if (++k > 40) { d.fail = true; return 0; }
    if (k <= 2) return (k << rparam) + d.bypass_bits(rparam);
    i32 len = k - 3 + rparam;
    if (len > 30) { d.fail = true; return 0; }
    return (3 << rparam) + (1 << len) - (1 << rparam) + d.bypass_bits(len);
}

// inverse of put_last_xy: returns the scan index of the last significant coeff
static i32 parse_last_xy(DecState& st, i32 sz, bool chroma, int stype) {
    CabacDec& d = st.d;
    CtxSet& c = st.ctxs;
    int szi = sz / 8;
    i32 addr = kLastAddr[chroma][szi], sft = kLastSft[chroma][szi];
    i32 gmax = kGroupIdx[sz - 1];
    i32 gx = 0, gy = 0;
    while (gx < gmax && d.bin(&c.v[CTX_LAST_X + 5 * addr + (gx >> sft)])) gx++;
    while (gy < gmax && d.bin(&c.v[CTX_LAST_Y + 5 * addr + (gy >> sft)])) gy++;
    i32 tx = gx, ty = gy;
    if (gx > 3) {
        i32 nb = (gx - 2) >> 1;
        tx = kMinInGroup[gx] + d.bypass_bits(nb);
    }
    if (gy > 3) {
        i32 nb = (gy - 2) >> 1;
        ty = kMinInGroup[gy] + d.bypass_bits(nb);
    }
    i32 y = (stype == SCAN_VER) ? tx : ty;
    i32 x = (stype == SCAN_VER) ? ty : tx;
    int si = sz == 4 ? 0 : sz == 8 ? 1 : sz == 16 ? 2 : 3;
    return SC.inv[si][stype][y * sz + x];
}

// inverse of put_coef: fills blk (stride sz) from the bitstream
static void parse_coef(DecState& st, i32 sz, bool chroma, i32 pmode, i32* blk) {
    CabacDec& d = st.d;
    CtxSet& c = st.ctxs;
    const uint16_t* scan;
    int stype = scan_select(sz, pmode, &scan);
    i32 ncg = sz / 4;
    int si = sz == 4 ? 0 : sz == 8 ? 1 : sz == 16 ? 2 : 3;
    const u8* sigtab = SC.sig[si][stype][0].data();
    std::memset(blk, 0, sizeof(i32) * sz * sz);

    i32 i_last = parse_last_xy(st, sz, chroma, stype);
    bool sig_map[8][8] = {};
    i32 sctx = 0, c1 = 1, nnz = 0;
    i32 pos_nz[16];
    bool sig_cg = true;

    for (i32 i = i_last; i >= 0 && !d.fail; i--) {
        i32 p = scan[i];
        i32 y = p / sz, x = p % sz;
        i32 ycg = y >> 2, xcg = x >> 2;
        bool is_final = (i == i_last);
        bool first_cg = (ycg == 0 && xcg == 0);
        bool first_in_cg = (i & 15) == 0;
        bool final_in_cg = ((i & 15) == 15) || is_final;

        if (final_in_cg) {
            bool right = xcg < ncg - 1 && sig_map[ycg][xcg + 1];
            bool below = ycg < ncg - 1 && sig_map[ycg + 1][xcg];
            sctx = ((i32)below << 1) | (i32)right;
            sigtab = SC.sig[si][stype][sctx].data();
            nnz = 0;
            if (!first_cg && !is_final)
                sig_cg = d.bin(&c.v[CTX_SIG_MAP + (sctx != 0)]) != 0;
            else
                sig_cg = true;   // CG of the last coeff: flag inferred 1
            sig_map[ycg][xcg] = sig_cg;
        }

        i32 sig;
        if (is_final) {
            sig = 1;
        } else if (first_cg || (sig_cg && (!first_in_cg || nnz > 0))) {
            i32 idx = chroma ? sig_ctx_idx(sz, chroma, stype, y, x, sctx) : sigtab[i];
            sig = d.bin(&c.v[CTX_SIG_SC + idx]);
        } else {
            // not coded: inferred 1 at the first position of a signalled CG
            // with no other significant coeff yet, else 0
            sig = (sig_cg && first_in_cg) ? 1 : 0;
        }
        if (sig) {
            if (nnz >= 16) { d.fail = true; return; }
            pos_nz[nnz++] = p;
        }

        if (first_in_cg && nnz > 0) {
            i32 cset = (chroma ? 4 : 0) + ((!chroma && !first_cg) ? 2 : 0) + (c1 == 0 ? 1 : 0);
            i32 g1[8];
            i32 c2j = -1;
            c1 = 1;
            for (i32 j = 0; j < 8 && j < nnz; j++) {
                g1[j] = d.bin(&c.v[CTX_ONE_SC + 4 * cset + c1]);
                if (g1[j]) {
                    c1 = 0;
                    if (c2j < 0) c2j = j;
                } else if (c1 > 0 && c1 < 3) c1++;
            }
            i32 c2v = 0;
            if (c1 == 0 && c2j >= 0) c2v = d.bin(&c.v[CTX_ABS_SC + cset]);
            i32 signs = d.bypass_bits(nnz);
            i32 absv[16];
            i32 fc2 = 3, rparam = 0;
            for (i32 j = 0; j < nnz; j++) {
                i32 thr = (j < 8) ? fc2 : 1;
                bool coded;
                i32 base;
                if (j >= 8) {
                    coded = true;
                    base = thr;
                } else if (!g1[j]) {
                    coded = false;
                    base = 1;
                } else if (j == c2j) {
                    coded = (c2v == 1);
                    base = coded ? thr : 2;
                } else {
                    coded = true;   // second+ greater1 coeff: threshold is 2
                    base = thr;
                }
                if (coded) {
                    i32 rem = read_exgolomb(d, rparam);
                    absv[j] = base + rem;
                    if (absv[j] > (3 << rparam)) rparam = rparam < 4 ? rparam + 1 : 4;
                } else {
                    absv[j] = base;
                }
                if (absv[j] >= 2) fc2 = 2;
            }
            for (i32 j = 0; j < nnz; j++) {
                i32 s = (signs >> (nnz - 1 - j)) & 1;
                blk[pos_nz[j]] = s ? -absv[j] : absv[j];
            }
        }
    }
}

// inverse of put_y_pmode for one PU given its left/above modes
struct PmodeParse {
    i32 flag;    // prev_intra_luma_pred_flag (parsed first for all PUs)
};

static i32 parse_pmode_value(CabacDec& d, i32 flag, i32 pl, i32 pa) {
    i32 mpm[3];
    probable_modes(pl, pa, mpm);
    if (flag) {
        i32 idx = 0;
        if (d.bypass()) idx = 1 + d.bypass();
        return mpm[idx];
    }
    i32 pm = d.bypass_bits(5);
    // undo the 3 decrements: add back in ascending mpm order
    i32 s0 = mpm[0], s1 = mpm[1], s2 = mpm[2];
    if (s0 > s1) std::swap(s0, s1);
    if (s1 > s2) std::swap(s1, s2);
    if (s0 > s1) std::swap(s0, s1);
    if (pm >= s0) pm++;
    if (pm >= s1) pm++;
    if (pm >= s2) pm++;
    return pm;
}

// predict + (optional) residual add for one TU; writes into the plane
static void recon_tu(DecState& st, i32 y, i32 x, i32 sz,
                     bool bll, bool blb, bool baa, bool bar,
                     i32 pmode, const i32* coef) {
    i32 top[1 + 2 * CTU], left[2 * CTU];
    for (i32 j = 0; j < 1 + 2 * sz; j++) top[j] = st.rc(y - 1, x - 1 + j);
    for (i32 i = 0; i < 2 * sz; i++) left[i] = st.rc(y + i, x - 1);
    Borders B;
    build_borders(sz, top, left, bll, blb, baa, bar, B);
    u8 pred[CTU * CTU];
    predict(sz, pmode, B, pred);
    if (coef) {
        i32 dq[CTU * CTU], inv[CTU * CTU];
        dequantize(st.qpd6, sz, coef, dq);
        inverse_transform(sz, dq, inv);
        for (i32 i = 0; i < sz; i++)
            for (i32 j = 0; j < sz; j++)
                st.rcon[(size_t)(y + i) * st.xszn + x + j] =
                    pixclip(inv[i * sz + j] + pred[i * sz + j]);
    } else {
        for (i32 i = 0; i < sz; i++)
            std::memcpy(&st.rcon[(size_t)(y + i) * st.xszn + x], pred + i * sz, sz);
    }
}

static void dec_cu(DecState& st, i32 y, i32 x, i32 sz,
                   bool bll, bool blb, bool baa, bool bar) {
    if (st.d.fail) return;
    CabacDec& d = st.d;
    CtxSet& c = st.ctxs;
    const i32 mr = st.mrow(y), mc = 1 + x / 4;
    const bool gl = sz > st.mcu(mr, mc - 1);
    const bool ga = sz > st.mcu(mr - 1, mc);
    const i32 pml = st.mpm(mr, mc - 1);
    const i32 pma = st.mpm(mr - 1, mc);
    const i32 ntu = sz / 4;

    if (sz >= 16 && d.bin(&c.v[CTX_SPLIT_CU + (gl ? 1 : 0) + (ga ? 1 : 0)])) {
        bool sf[4][4];
        sub_flags(bll, blb, baa, bar, sf);
        i32 h = sz / 2;
        for (int k = 0; k < 4; k++)
            dec_cu(st, y + kSubOff[k][0] * h, x + kSubOff[k][1] * h, h,
                   sf[k][0], sf[k][1], sf[k][2], sf[k][3]);
        return;
    }

    i32 nxn = 0;
    if (sz == MIN_CU) nxn = d.bin(&c.v[CTX_PARTSIZE]) == 0;   // encoder: bin(nxn?0:1)

    static thread_local i32 coef[CTU * CTU];

    if (!nxn) {
        i32 flag = d.bin(&c.v[CTX_Y_PMODE]);
        i32 pm = parse_pmode_value(d, flag, pml, pma);
        d.bin(&c.v[CTX_UV_PMODE]);                            // uv pmode (always 0)
        i32 tsplit = 0;
        if (sz == 32) tsplit = d.bin(&c.v[CTX_SPLIT_TU + 0]);
        else if (sz == 16) tsplit = d.bin(&c.v[CTX_SPLIT_TU + 1]);
        else tsplit = d.bin(&c.v[CTX_SPLIT_TU + 2]);
        d.bin(&c.v[CTX_UV_QT_CBF + 0]);                       // cbf_cb (0)
        d.bin(&c.v[CTX_UV_QT_CBF + 0]);                       // cbf_cr (0)
        if (!tsplit) {
            i32 cbf = d.bin(&c.v[CTX_Y_QT_CBF + 1]);          // depth 0
            if (cbf) parse_coef(st, sz, false, pm, coef);
            recon_tu(st, y, x, sz, bll, blb, baa, bar, pm, cbf ? coef : nullptr);
        } else {
            i32 h = sz / 2;
            bool sf[4][4];
            sub_flags(bll, blb, baa, bar, sf);
            for (int k = 0; k < 4; k++) {
                i32 cbf = d.bin(&c.v[CTX_Y_QT_CBF + 0]);      // depth 1
                if (cbf) parse_coef(st, h, false, pm, coef);
                recon_tu(st, y + kSubOff[k][0] * h, x + kSubOff[k][1] * h, h,
                         sf[k][0], sf[k][1], sf[k][2], sf[k][3], pm,
                         cbf ? coef : nullptr);
            }
        }
        for (i32 r = 0; r < ntu; r++) {
            std::memset(&st.mcu(mr + r, mc), sz, ntu);
            std::memset(&st.mpm(mr + r, mc), pm, ntu);
        }
    } else {
        // NxN: four 4x4 PUs (sz == 8)
        i32 h = sz / 2;
        bool sf[4][4];
        sub_flags(bll, blb, baa, bar, sf);
        i32 flags[4], pm[4] = {0, 0, 0, 0};
        for (int k = 0; k < 4; k++) flags[k] = d.bin(&c.v[CTX_Y_PMODE]);
        for (int k = 0; k < 4; k++) {
            i32 pl, pa;
            switch (k) {   // neighbor wiring per the encoder's put_cu_nxn call
                case 0: pl = pml; pa = pma; break;
                case 1: pl = pm[0]; pa = st.mpm(st.mrow(y) - 1, 1 + (x + h) / 4); break;
                case 2: pl = st.mpm(st.mrow(y + h), 1 + x / 4 - 1); pa = pm[0]; break;
                default: pl = pm[2]; pa = pm[1]; break;
            }
            pm[k] = parse_pmode_value(d, flags[k], pl, pa);
        }
        d.bin(&c.v[CTX_UV_PMODE]);
        d.bin(&c.v[CTX_UV_QT_CBF + 0]);
        d.bin(&c.v[CTX_UV_QT_CBF + 0]);
        for (int k = 0; k < 4; k++) {
            i32 cbf = d.bin(&c.v[CTX_Y_QT_CBF + 0]);          // depth 1
            if (cbf) parse_coef(st, h, false, pm[k], coef);
            recon_tu(st, y + kSubOff[k][0] * h, x + kSubOff[k][1] * h, h,
                     sf[k][0], sf[k][1], sf[k][2], sf[k][3], pm[k],
                     cbf ? coef : nullptr);
        }
        for (i32 r = 0; r < ntu; r++) std::memset(&st.mcu(mr + r, mc), sz, ntu);
        st.mpm(st.mrow(y), 1 + x / 4) = (u8)pm[0];
        st.mpm(st.mrow(y), 1 + (x + h) / 4) = (u8)pm[1];
        st.mpm(st.mrow(y + h), 1 + x / 4) = (u8)pm[2];
        st.mpm(st.mrow(y + h), 1 + (x + h) / 4) = (u8)pm[3];
    }
}

struct Headers {
    i32 width = 0, height = 0, qpd6 = -1;
    bool ok = false;
    const char* err = "";
};

// parse SPS/PPS/slice headers by the spec; reject streams using features
// outside the decode subset
static Headers parse_headers(const u8* s, size_t n, size_t* slice_off,
                             size_t* cabac_off) {
    Headers H;
    // NAL split at 3-byte start codes (the encoder emits only those)
    std::vector<std::pair<size_t, size_t>> nals;   // (offset, len) past start code
    for (size_t k = 0; k + 2 < n; k++) {
        if (s[k] == 0 && s[k + 1] == 0 && s[k + 2] == 1) {
            if (!nals.empty() && nals.back().second == 0)
                nals.back().second = k - nals.back().first;
            nals.push_back({k + 3, 0});
            k += 2;
        }
    }
    if (!nals.empty() && nals.back().second == 0)
        nals.back().second = n - nals.back().first;

    i32 init_qp_minus26 = 0, output_flag_present = 0, extra_bits = 0;
    i32 chroma_qp_offsets_present = 0, db_override_enabled = 0;
    i32 db_control_present = 0, pps_db_disabled = 0, loop_across = 0;
    bool have_sps = false, have_pps = false;

    for (auto& [off, len] : nals) {
        if (len < 2) continue;
        i32 type = (s[off] >> 1) & 0x3F;
        BitReader r;
        if (type == 33 && !have_sps) {   // SPS
            r.load(s + off, len);
            r.bits(16);                  // nal header
            r.bits(4); i32 msl = r.bits(3); r.bit();
            if (msl != 0) { H.err = "sps: sub-layers unsupported"; return H; }
            r.bits(32); r.bits(32); r.bits(32);   // profile_tier_level (96 bits)
            r.ue();                               // sps id
            if (r.ue() != 1) { H.err = "sps: chroma_format != 4:2:0"; return H; }
            H.width = r.ue();
            H.height = r.ue();
            if (r.bit()) { r.ue(); r.ue(); r.ue(); r.ue(); }  // conformance window
            if (r.ue() != 0 || r.ue() != 0) { H.err = "sps: bit depth != 8"; return H; }
            r.ue();                               // log2_max_poc
            i32 subord = r.bit();
            (void)subord;
            r.ue(); r.ue(); r.ue();               // ordering info (one layer)
            i32 min_cb = r.ue(), diff_cb = r.ue();
            i32 min_tb = r.ue(), diff_tb = r.ue();
            r.ue();                               // max_transform_depth_inter
            i32 xdep = r.ue();                    // max_transform_depth_intra
            i32 scal = r.bit(), amp = r.bit(), sao = r.bit(), pcm = r.bit();
            if (min_cb != 0 || diff_cb != 2 || min_tb != 0 || diff_tb != 3 || xdep != 1)
                { H.err = "sps: block geometry outside subset"; return H; }
            if (scal || amp || sao || pcm)
                { H.err = "sps: scaling/amp/sao/pcm unsupported"; return H; }
            if (r.fail) { H.err = "sps: truncated"; return H; }
            if (H.width <= 0 || H.height <= 0 || H.width > 8192 || H.height > 8192 ||
                (H.width % 32) || (H.height % 32))
                { H.err = "sps: bad picture dims"; return H; }
            have_sps = true;
        } else if (type == 34 && !have_pps) {   // PPS
            r.load(s + off, len);
            r.bits(16);
            r.ue(); r.ue();                       // pps id, sps id
            r.bit();                              // dependent_slice_segments
            output_flag_present = r.bit();
            extra_bits = r.bits(3);
            i32 signhide = r.bit();
            r.bit();                              // cabac_init_present
            r.ue(); r.ue();                       // num_ref_idx defaults
            init_qp_minus26 = r.se();
            r.bit();                              // constrained_intra_pred
            i32 tskip = r.bit();
            i32 cuqp = r.bit();
            if (cuqp) r.ue();
            r.se(); r.se();                       // cb/cr qp offsets
            chroma_qp_offsets_present = r.bit();
            r.bit(); r.bit();                     // weighted pred flags
            i32 tqb = r.bit();
            i32 tiles = r.bit();
            i32 ents = r.bit();
            if (signhide || tskip || cuqp || tqb || tiles || ents)
                { H.err = "pps: tool outside subset"; return H; }
            loop_across = r.bit();
            db_control_present = r.bit();
            if (db_control_present) {
                db_override_enabled = r.bit();
                pps_db_disabled = r.bit();
                if (!pps_db_disabled) { r.se(); r.se(); }   // beta/tc offsets
            }
            if (r.bit()) { H.err = "pps: scaling list unsupported"; return H; }
            if (r.fail) { H.err = "pps: truncated"; return H; }
            have_pps = true;
        } else if (type >= 16 && type <= 21) {   // IRAP slice
            if (!have_sps || !have_pps) { H.err = "slice before sps/pps"; return H; }
            r.load(s + off, len);
            r.bits(16);
            if (!r.bit()) { H.err = "slice: not first segment"; return H; }
            r.bit();                              // no_output_of_prior_pics
            r.ue();                               // pps id
            for (i32 i = 0; i < extra_bits; i++) r.bit();
            if (r.ue() != 2) { H.err = "slice: not an I slice"; return H; }
            if (output_flag_present) r.bit();
            i32 qp_delta = r.se();
            if (chroma_qp_offsets_present) { r.se(); r.se(); }
            // deblocking state affects only the display output (see note
            // above) but must be parsed to locate the alignment correctly
            i32 slice_db_disabled = pps_db_disabled;
            if (db_control_present && db_override_enabled && r.bit()) {
                slice_db_disabled = r.bit();
                if (!slice_db_disabled) { r.se(); r.se(); }   // slice beta/tc
            }
            if (loop_across && !slice_db_disabled) r.bit();
            if (r.fail) { H.err = "slice: truncated header"; return H; }
            // byte alignment: one 1 bit + zeros
            if (!r.bit()) { H.err = "slice: bad alignment"; return H; }
            while (r.bitpos & 7)
                if (r.bit()) { H.err = "slice: bad alignment"; return H; }
            i32 qp = 26 + init_qp_minus26 + qp_delta;
            if (qp < 4 || (qp - 4) % 6 || (qp - 4) / 6 > 4)
                { H.err = "slice: qp outside subset"; return H; }
            H.qpd6 = (qp - 4) / 6;
            *slice_off = off;
            *cabac_off = r.bitpos >> 3;           // offset in unescaped RBSP
            H.ok = true;
            return H;
        }
    }
    H.err = "no slice found";
    return H;
}

static i64 decode(const u8* stream, size_t n, i32* ysz, i32* xsz, u8* luma_out) {
    size_t slice_off = 0, cabac_off = 0;
    Headers H = parse_headers(stream, n, &slice_off, &cabac_off);
    if (!H.ok) return -1;
    *ysz = H.height;
    *xsz = H.width;
    if (!luma_out) return 0;   // dims-only query

    DecState st;
    st.qpd6 = H.qpd6;
    st.yszn = H.height;
    st.xszn = H.width;
    st.rcon.assign((size_t)st.yszn * st.xszn, 0);
    st.map_w = 1 + st.xszn / 4;
    st.map_cu_sz.assign((size_t)9 * st.map_w, CTU);
    st.map_pmode.assign((size_t)9 * st.map_w, 1);   // DC
    st.ctxs.init(st.qpd6);

    // slice NAL extent: to the next start code or end of stream
    size_t slice_end = n;
    for (size_t k = slice_off; k + 2 < n; k++)
        if (stream[k] == 0 && stream[k + 1] == 0 && stream[k + 2] == 1) {
            slice_end = k;
            break;
        }
    BitReader rb;
    rb.load(stream + slice_off, slice_end - slice_off);
    if (cabac_off >= rb.buf.size()) return -1;
    st.d.init(rb.buf.data() + cabac_off, rb.buf.size() - cabac_off);

    for (i32 y = 0; y < st.yszn && !st.d.fail; y += CTU) {
        st.ctu_y = y;
        for (i32 x = 0; x < st.xszn && !st.d.fail; x += CTU) {
            bool bll = x > 0, baa = y > 0;
            bool bar = baa && (x + CTU < st.xszn);
            dec_cu(st, y, x, CTU, bll, false, baa, bar);
            bool last = (y + CTU >= st.yszn) && (x + CTU >= st.xszn);
            i32 end = st.d.terminate();
            // The final end_of_slice_segment_flag is accepted as 0 OR 1: the
            // reference flush truncates bit 7 of low (tail = (low>>8)<<nbits,
            // reference src/HEVCe.c:849-855), so when that bit is set the
            // flushed value lands 128 below the terminate-1 subinterval and
            // a strict arithmetic decoder reads 0 (measured on ~half of all
            // streams; the picture is complete either way). Mid-picture
            // terminates are checked strictly.
            if (!last && end != 0) return -2;       // slice ended early
        }
        std::memcpy(&st.mcu(0, 1), &st.mcu(8, 1), st.map_w - 1);
    }
    if (st.d.fail) return -3;
    std::memcpy(luma_out, st.rcon.data(), st.rcon.size());
    return (i64)st.rcon.size();
}

}  // namespace dec

}  // namespace hevce

// ---------------------------------------------------------------------------
// C ABI (ctypes binding surface)
// ---------------------------------------------------------------------------

extern "C" {

int hevce_encode_many_hinted(const uint8_t* imgs, int n, int ysz, int xsz,
                             int qpd6, const int8_t* hints, int nthreads,
                             uint8_t* streams_out, long long stream_cap,
                             long long* lens_out, uint8_t* rcons_out);

// mirrors the reference contract HEVCImageEncoder (reference src/HEVCe.h:5-12)
// plus an explicit stream_out capacity: returns -2 (no write) if the encoded
// stream would exceed it. Pass stream_cap=0 to skip the check (trusted caller
// sized from hevce_stream_capacity).
long long hevce_encode(const uint8_t* img, int* ysz, int* xsz, int qpd6,
                       uint8_t* stream_out, long long stream_cap,
                       uint8_t* rcon_out) {
    if (qpd6 < 0 || qpd6 > 4 || *ysz <= 0 || *xsz <= 0) return -1;
    return hevce::encode(img, ysz, xsz, qpd6, stream_out, rcon_out, nullptr,
                         (size_t)stream_cap);
}

// --- independent decoder -----------------------------------------------------

// Decode an .h265 stream from this encoder subset. With luma_out == nullptr,
// only parses headers and sets *ysz/*xsz (the padded dims) — use this to size
// the buffer, then call again. Returns decoded luma bytes (ysz*xsz) on
// success, 0 on the dims-only query, negative on malformed/unsupported input.
long long hevce_decode(const uint8_t* stream, long long n, int* ysz, int* xsz,
                       uint8_t* luma_out) {
    if (!stream || n <= 4) return -1;
    return hevce::dec::decode(stream, (size_t)n, ysz, xsz, luma_out);
}

// worst-case stream bytes for one (unpadded) ysz x xsz image
long long hevce_stream_capacity(int ysz, int xsz) {
    int yp = (ysz + 31) / 32 * 32, xp = (xsz + 31) / 32 * 32;
    return (long long)hevce::stream_capacity(yp, xp);
}

int hevce_version() { return 16; }

// pack a pre-decided CU forest (wavefront fast mode) into a compliant stream;
// record layout documented at hevce::PackRec. Returns stream bytes or -2 if
// cap is too small.
long long hevce_pack(const int* lay, const int* pm, const int* pm4,
                     const int* qc,
                     int ysz, int xsz, int qpd6, uint8_t* stream_out,
                     long long cap) {
    if (qpd6 < 0 || qpd6 > 4 || ysz <= 0 || xsz <= 0 || !qc) return -1;
    return hevce::pack_stream(lay, pm, pm4, qc, nullptr, ysz, xsz, qpd6,
                              stream_out, cap, nullptr);
}

// pack a pre-decided CU forest from DECISIONS ONLY (lay/pm/pm4 + the original
// image): quant levels are recomputed on the host (bit-identical candidate
// math — see hevce::replay_cu), so the device fast path need not transfer
// them. rcon_out (optional, padded dims) receives the reconstruction the
// stream decodes to. Returns stream bytes, -2 if cap is too small.
long long hevce_pack_img(const int* lay, const int* pm, const int* pm4,
                         const uint8_t* img, int ysz, int xsz, int qpd6,
                         uint8_t* stream_out, long long cap,
                         uint8_t* rcon_out) {
    if (qpd6 < 0 || qpd6 > 4 || ysz <= 0 || xsz <= 0 || !img) return -1;
    return hevce::pack_stream(lay, pm, pm4, nullptr, img, ysz, xsz, qpd6,
                              stream_out, cap, rcon_out);
}

// realized CABAC stats of the calling thread's LAST hevce_pack/_pack_img:
// out3 = {cabac payload bits, context-coded bins, bypass bins}. The fast
// mode's corrective pass derives the realized avg context-bin cost
// (bits - bypass) / nctx from these (models/wavefront.py).
void hevce_last_pack_stats(long long* out3) {
    out3[0] = hevce::g_last_pack_bits;
    out3[1] = hevce::g_last_pack_nctx;
    out3[2] = hevce::g_last_pack_nbyp;
}

// --- lockstep batch API -----------------------------------------------------

void* hevce_batch_create(const uint8_t* imgs, int B, int ysz, int xsz, int qpd6) {
    if (B <= 0 || qpd6 < 0 || qpd6 > 4 || ysz <= 0 || xsz <= 0) return nullptr;
    auto* be = new hevce::BatchEngine(imgs, B, ysz, xsz, qpd6);
    for (int s = 0; s < B; s++)
        be->threads.emplace_back(hevce::batch_worker, be, s);
    return be;
}

// blocks until all workers request math (or all finished).
// returns 0 (node event), 1 (pu event), 2 (done), 3 (node fetch),
// 4 (pu fetch); *sz_out = CU size. Fetch events follow every node/pu
// event: workers post a per-slot selector in buffer 16 (-2 none, -1 all
// lanes, >=0 flat winner lane) and the driver materializes only those
// lanes' quant/recon into the result buffers.
int hevce_batch_next(void* h, int* sz_out) {
    return static_cast<hevce::BatchEngine*>(h)->next(sz_out);
}

// resume workers after results were written into the result buffers
void hevce_batch_supply(void* h) {
    static_cast<hevce::BatchEngine*>(h)->supply();
}

// shared buffer base pointers: 0 req_top(i32 Bx65), 1 req_left(i32 Bx64),
// 2 req_flags(u8 Bx4), 3 req_orig(i32 Bx1024), 4 res_quant(i32 Bx35x1024),
// 5 res_recon(u8 Bx35x1024), 6 res_sse(i32 Bx35), 7 res_quant4(i32 Bx35x1024),
// 8 res_recon4(u8 Bx35x1024), 9 res_sse4(i32 Bx35),
// 10 res_rates(i32 Bx35, PU fresh-coder rates), 11 res_rates2(i32 Bx35,
// step-2 trial rates vs fork state), 12 res_rates3(i32 Bx35, step-3),
// 13 req_state(i32 Bx7 coder fork scalars), 14 req_ctxs(i32 Bx142 context
// values), 15 req_meta(i32 Bx4: pml, pma, gl, ga), 16 req_fetch(i32 B)
void* hevce_batch_buf(void* h, int which) {
    auto* be = static_cast<hevce::BatchEngine*>(h);
    switch (which) {
        case 0: return be->req_top.data();
        case 1: return be->req_left.data();
        case 2: return be->req_flags.data();
        case 3: return be->req_orig.data();
        case 4: return be->res_quant.data();
        case 5: return be->res_recon.data();
        case 6: return be->res_sse.data();
        case 7: return be->res_quant4.data();
        case 8: return be->res_recon4.data();
        case 9: return be->res_sse4.data();
        case 10: return be->res_rates.data();
        case 11: return be->res_rates2.data();
        case 12: return be->res_rates3.data();
        case 13: return be->req_state.data();
        case 14: return be->req_ctxs.data();
        case 15: return be->req_meta.data();
        case 16: return be->req_fetch.data();
        default: return nullptr;
    }
}

long long hevce_batch_stream(void* h, int slot, uint8_t* out) {
    auto* be = static_cast<hevce::BatchEngine*>(h);
    auto& s = be->streams[slot];
    if (out) std::memcpy(out, s.data(), s.size());
    return (long long)s.size();
}

void hevce_batch_rcon(void* h, int slot, uint8_t* out) {
    auto* be = static_cast<hevce::BatchEngine*>(h);
    std::memcpy(out, be->rcons[slot].data(), be->rcons[slot].size());
}

// free-run blocked workers (their results are garbage and must be discarded);
// call before destroy when the driver aborts mid-encode
void hevce_batch_abort(void* h) {
    static_cast<hevce::BatchEngine*>(h)->abort();
}

void hevce_batch_destroy(void* h) {
    auto* be = static_cast<hevce::BatchEngine*>(h);
    for (auto& t : be->threads) t.join();
    delete be;
}

// pure-native parallel batch encode over nthreads host workers.
// imgs: n contiguous (ysz, xsz) images; streams_out is n slots of
// stream_cap bytes each (size with hevce_stream_capacity); rcons_out is
// n * padded dims; lens_out: n entries. Returns 0 on success, -2 if any
// stream exceeds stream_cap (nothing is written past a slot).
int hevce_encode_many(const uint8_t* imgs, int n, int ysz, int xsz, int qpd6,
                      int nthreads, uint8_t* streams_out, long long stream_cap,
                      long long* lens_out, uint8_t* rcons_out) {
    return hevce_encode_many_hinted(imgs, n, ysz, xsz, qpd6, nullptr, nthreads,
                                    streams_out, stream_cap, lens_out, rcons_out);
}

// like hevce_encode_many, with optional device-oracle trial-order hints
// (n * ctus * 106 int8, raster CTU order; see EncState::hints). Streams are
// bit-identical with or without hints — hints only accelerate the search.
int hevce_encode_many_hinted(const uint8_t* imgs, int n, int ysz, int xsz,
                             int qpd6, const int8_t* hints, int nthreads,
                             uint8_t* streams_out, long long stream_cap,
                             long long* lens_out, uint8_t* rcons_out) {
    if (n <= 0 || qpd6 < 0 || qpd6 > 4 || ysz <= 0 || xsz <= 0) return -1;
    hevce::NativeBatch nb;
    nb.imgs = imgs; nb.n = n; nb.ysz = ysz; nb.xsz = xsz; nb.qpd6 = qpd6;
    nb.hints = hints;
    hevce::native_batch_encode(nb, nthreads < 1 ? 1 : nthreads);
    int yp = (ysz + 31) / 32 * 32, xp = (xsz + 31) / 32 * 32;
    size_t cap = (size_t)stream_cap;
    for (int i = 0; i < n; i++) {
        if (nb.streams[i].size() > cap) return -2;
        lens_out[i] = (long long)nb.streams[i].size();
        std::memcpy(streams_out + (size_t)i * cap, nb.streams[i].data(),
                    nb.streams[i].size());
        std::memcpy(rcons_out + (size_t)i * yp * xp, nb.rcons[i].data(),
                    (size_t)yp * xp);
    }
    return 0;
}
}
