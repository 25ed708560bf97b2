/* Minimal ASCII-SLOW5 reader with the API subset the reference's rsig.c
 * uses (slow5_open/close, slow5_get_next, record fields), so the reference
 * rawhash2 binary can be built hermetically (-DNHDF5RH -DNPOD5RH) for the
 * PAF-equivalence harness.  Reference API: hasindu2008/slow5lib. */
#ifndef SLOW5_STUB_H
#define SLOW5_STUB_H
#include <stdint.h>
#include <stdio.h>
/* the real slow5lib transitively exposes klib khash (slow5.h includes
 * slow5/klib/khash.h); the reference's rmap.cpp relies on that for
 * __ac_Wang_hash, so mirror it here */
#include "khash.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
    char *read_id;
    uint32_t read_group;
    double digitisation;
    double offset;
    double range;
    double sampling_rate;
    uint64_t len_raw_signal;
    int16_t *raw_signal;
} slow5_rec_t;

typedef struct slow5_file {
    FILE *fp;
} slow5_file_t;

#define SLOW5_ERR_EOF (-1)

slow5_file_t *slow5_open(const char *fn, const char *mode);
int slow5_close(slow5_file_t *fp);
int slow5_get_next(slow5_rec_t **rec, slow5_file_t *fp);
void slow5_rec_free(slow5_rec_t *rec);

#ifdef __cplusplus
}
#endif
#endif
