// Native token-mask kernel for constrained decoding.
//
// Reference analog: the xgrammar apply_token_bitmask CUDA/C++ kernels the
// reference serving stack uses for 100k+ vocab grammar masking
// (srt/constrained/). Here the grammar is a char-class DFA (compiled in
// Python from the regex NFA); tokens are pre-mapped to class-id
// sequences. For a given DFA state, the kernel walks every token's class
// sequence through the transition table and sets one bit per accepted
// token. 128k tokens x ~4 transitions is microseconds of table walks —
// the Python per-token path this replaces is O(vocab) dict lookups.

#include <cstdint>
#include <cstring>

extern "C" {

// trans: [num_states * num_classes] int32, -1 = reject
// tok_classes: concatenated class-id sequences (int32)
// tok_offsets: [num_tokens + 1] int64 offsets into tok_classes
// tok_valid:  [num_tokens] uint8 (0 = token never matchable)
// out_mask:   [num_tokens] uint8 (1 = allowed from `state`)
void dfa_fill_mask(const int32_t* trans, int32_t num_classes,
                   const int32_t* tok_classes, const int64_t* tok_offsets,
                   const uint8_t* tok_valid, int64_t num_tokens,
                   int32_t state, uint8_t* out_mask) {
    for (int64_t t = 0; t < num_tokens; ++t) {
        if (!tok_valid[t]) { out_mask[t] = 0; continue; }
        int32_t s = state;
        for (int64_t i = tok_offsets[t]; i < tok_offsets[t + 1]; ++i) {
            s = trans[(int64_t)s * num_classes + tok_classes[i]];
            if (s < 0) break;
        }
        out_mask[t] = (uint8_t)(s >= 0);
    }
}

// Batch variant: masks for several states at once (amortizes the call).
void dfa_fill_masks(const int32_t* trans, int32_t num_classes,
                    const int32_t* tok_classes, const int64_t* tok_offsets,
                    const uint8_t* tok_valid, int64_t num_tokens,
                    const int32_t* states, int32_t num_states_q,
                    uint8_t* out_masks /* [num_states_q * num_tokens] */) {
    for (int32_t q = 0; q < num_states_q; ++q) {
        dfa_fill_mask(trans, num_classes, tok_classes, tok_offsets,
                      tok_valid, num_tokens, states[q],
                      out_masks + (int64_t)q * num_tokens);
    }
}

}  // extern "C"
