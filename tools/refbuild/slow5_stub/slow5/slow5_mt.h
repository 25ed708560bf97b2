/* Batched-read API subset (see slow5.h). */
#ifndef SLOW5_MT_STUB_H
#define SLOW5_MT_STUB_H
#include "slow5.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
    slow5_file_t *fp;
} slow5_mt_t;

typedef struct {
    slow5_rec_t **slow5_rec;
    int capacity;
    int n;
} slow5_batch_t;

slow5_mt_t *slow5_init_mt(int n_threads, slow5_file_t *fp);
slow5_batch_t *slow5_init_batch(int capacity);
int slow5_get_next_batch(slow5_mt_t *mt, slow5_batch_t *batch, int n);
void slow5_free_batch(slow5_batch_t *b);
void slow5_free_mt(slow5_mt_t *mt);

#ifdef __cplusplus
}
#endif
#endif
