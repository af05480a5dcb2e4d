/* fast_bpe.c — byte-pair-encoding merge loop as a C hot path.
 *
 * The CLIP text modality tokenizes ~1024 symbolic descriptions per
 * training iteration on the host (SURVEY §7 hard part 6). The BPE merge
 * loop dominates that cost in Python; this translation unit implements it
 * over integer symbol ids with the merge table flattened into three
 * parallel arrays sorted by pair key, so rank lookup is a binary search
 * and the whole encode is allocation-free.
 *
 * Contract (mirrors BPETokenizer.bpe, tokenizer.py):
 *   - `syms` holds the word's current symbol ids (byte tokens, last one
 *     the </w> variant);
 *   - repeatedly find the adjacent pair with the lowest merge rank and
 *     replace every left-to-right occurrence of that exact pair;
 *   - stop when no adjacent pair is in the table.
 *
 * Built by clip_ppo_tpu.native (gcc -O2 -shared -fPIC), bound via ctypes
 * — no pybind11 dependency. A Python fallback with identical semantics
 * remains in tokenizer.py (parity-tested).
 */

#include <stdint.h>

#define KEY(a, b) (((uint64_t)(uint32_t)(a) << 32) | (uint32_t)(b))

/* Binary search `keys` (sorted ascending, length n) for `key`.
 * Returns the index or -1. */
static int64_t find_pair(const uint64_t *keys, int64_t n, uint64_t key) {
    int64_t lo = 0, hi = n - 1;
    while (lo <= hi) {
        int64_t mid = lo + (hi - lo) / 2;
        if (keys[mid] == key) return mid;
        if (keys[mid] < key) lo = mid + 1;
        else hi = mid - 1;
    }
    return -1;
}

/* Encode one word in place.
 *
 * syms/n_syms: symbol ids (modified in place; shrinks as pairs merge).
 * keys:        sorted pair keys ((left << 32) | right).
 * ranks:       merge priority per key (lower merges first).
 * new_ids:     merged-symbol id per key.
 * n_pairs:     table size.
 *
 * Returns the final number of symbols. */
int32_t fast_bpe_encode(int32_t *syms, int32_t n_syms,
                        const uint64_t *keys, const int32_t *ranks,
                        const int32_t *new_ids, int64_t n_pairs) {
    int32_t n = n_syms;
    while (n > 1) {
        int32_t best_rank = INT32_MAX;
        int64_t best_idx = -1;
        for (int32_t i = 0; i + 1 < n; i++) {
            int64_t idx = find_pair(keys, n_pairs, KEY(syms[i], syms[i + 1]));
            if (idx >= 0 && ranks[idx] < best_rank) {
                best_rank = ranks[idx];
                best_idx = idx;
            }
        }
        if (best_idx < 0) break;
        /* Merge every left-to-right occurrence of the winning pair. */
        uint64_t key = keys[best_idx];
        int32_t left = (int32_t)(key >> 32);
        int32_t right = (int32_t)(key & 0xffffffffu);
        int32_t merged = new_ids[best_idx];
        int32_t w = 0;
        for (int32_t r = 0; r < n;) {
            if (r + 1 < n && syms[r] == left && syms[r + 1] == right) {
                syms[w++] = merged;
                r += 2;
            } else {
                syms[w++] = syms[r++];
            }
        }
        n = w;
    }
    return n;
}

/* Batched variant: `all_syms` holds words back to back; `offsets` has
 * B+1 entries delimiting each word. Encodes every word in place and
 * writes per-word output lengths to `out_lens`. Single C call per
 * tokenize() batch — the ctypes crossing is paid once, not per word. */
void fast_bpe_encode_batch(int32_t *all_syms, const int64_t *offsets,
                           int64_t n_words,
                           const uint64_t *keys, const int32_t *ranks,
                           const int32_t *new_ids, int64_t n_pairs,
                           int32_t *out_lens) {
    for (int64_t b = 0; b < n_words; b++) {
        int32_t *word = all_syms + offsets[b];
        int32_t n = (int32_t)(offsets[b + 1] - offsets[b]);
        out_lens[b] = fast_bpe_encode(word, n, keys, ranks, new_ids, n_pairs);
    }
}
