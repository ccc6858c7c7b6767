/* LDGM staircase XOR encoder — host fast path.
 *
 * Mirrors the reference's CPU implementation (ref:
 * ldgm/src/ldgm-session-cpu.cpp:151-189: per parity row, XOR the data
 * symbols selected by the sparse parity-check row into an accumulator that
 * carries across rows — the staircase).  Plain C with 64-bit XOR; the
 * compiler vectorizes the inner loop.
 *
 * rows: flattened [m][row_len] int32 data-symbol indices, -1 = unused slot.
 */

#include <stdint.h>
#include <string.h>

void ldgm_encode_xor(const uint8_t *data, int64_t k, int64_t ps,
                     const int32_t *rows, int32_t m, int32_t row_len,
                     uint8_t *parity)
{
    uint64_t *acc = (uint64_t *)parity; /* reuse output row as accumulator */
    int64_t words = ps / 8;
    for (int32_t i = 0; i < m; i++) {
        uint64_t *out = (uint64_t *)(parity + (size_t)i * ps);
        if (i == 0) {
            memset(out, 0, (size_t)ps);
        } else {
            memcpy(out, parity + (size_t)(i - 1) * ps, (size_t)ps);
        }
        for (int32_t j = 0; j < row_len; j++) {
            int32_t idx = rows[(size_t)i * row_len + j];
            if (idx < 0 || idx >= k) continue;
            const uint64_t *src = (const uint64_t *)(data + (size_t)idx * ps);
            for (int64_t w = 0; w < words; w++) {
                out[w] ^= src[w];
            }
            /* ps is always a multiple of 4 (k*4 alignment); handle a
             * possible 4-byte tail */
            if (ps & 7) {
                const uint8_t *s8 = data + (size_t)idx * ps + words * 8;
                uint8_t *o8 = parity + (size_t)i * ps + words * 8;
                for (int64_t b = 0; b < (ps & 7); b++) o8[b] ^= s8[b];
            }
        }
    }
    (void)acc;
}
