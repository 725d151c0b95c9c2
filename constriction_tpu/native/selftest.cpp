// Standalone self-test binary for the native host codec — the analog of the
// reference's `ensure_no_std` harness (/root/reference/ensure_no_std/src/
// main.rs): proves the coder state machines stand alone with no Python (and
// no heap beyond a few fixed buffers), by round-tripping a small message
// through the exact rANS algebra at the default preset.
//
// Build + run:  g++ -O2 -std=c++17 -o /tmp/ctpu_selftest \
//                   constriction_tpu/native/selftest.cpp && /tmp/ctpu_selftest

#include <cstdint>
#include <cstdio>

// Reuse the exported C implementations directly.  surrogate.cpp provides
// the fast-path evaluators codec.cpp references; in this standalone build
// they get strict FP flags, which only makes the surrogate slower, never
// wrong (its outputs are margin-checked).
#include "codec.cpp"
#include "surrogate.cpp"

int main() {
    // A 5-symbol categorical model over {0,1,2} at precision 24
    // (cdf = fast-quantized [0.1, 0.6, 0.3]).
    const uint32_t cdf[4] = {0, 1677722, 11744052, 16777216};
    const int32_t msg[5] = {2, 0, 1, 1, 2};
    uint32_t cums[5], probs[5];
    for (int i = 0; i < 5; i++) {
        cums[i] = cdf[msg[i]];
        probs[i] = cdf[msg[i] + 1] - cdf[msg[i]];
    }

    uint64_t state = 1ull << 32;  // seed at 2^(S-W), default preset 32/64/24
    uint32_t words[16];
    int64_t nw = ctpu_ans_encode_reverse(
        &state, words, 0, cums, probs, 5, 32, 64, 24);

    int32_t out[5];
    int64_t nw2 = ctpu_ans_decode_cdf(
        &state, words, nw, cdf, 3, out, 5, 32, 64, 24);

    bool ok = (nw2 == 0) && (state == (1ull << 32));
    for (int i = 0; i < 5; i++) ok = ok && (out[i] == msg[i]);
    std::printf(ok ? "ctpu native selftest: OK\n"
                   : "ctpu native selftest: FAILED\n");
    return ok ? 0 : 1;
}
