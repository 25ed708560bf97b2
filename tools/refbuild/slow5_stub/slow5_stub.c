/* ASCII SLOW5 parser backing the stub API (columns per the SLOW5 spec:
 * read_id read_group digitisation offset range sampling_rate
 * len_raw_signal raw_signal[,comma separated]). */
#include "slow5/slow5.h"
#include "slow5/slow5_mt.h"
#include <stdlib.h>
#include <string.h>

slow5_file_t *slow5_open(const char *fn, const char *mode)
{
    FILE *f = fopen(fn, mode);
    if (!f) return NULL;
    slow5_file_t *sp = (slow5_file_t *)calloc(1, sizeof(slow5_file_t));
    sp->fp = f;
    return sp;
}

int slow5_close(slow5_file_t *sp)
{
    if (!sp) return -1;
    if (sp->fp) fclose(sp->fp);
    free(sp);
    return 0;
}

static void rec_clear(slow5_rec_t *r)
{
    free(r->read_id);
    free(r->raw_signal);
    r->read_id = NULL;
    r->raw_signal = NULL;
}

static int parse_line(char *line, slow5_rec_t *r)
{
    /* tab-separated: read_id rg dig offset range rate len signal */
    char *save = NULL;
    char *tok = strtok_r(line, "\t", &save);
    int col = 0;
    char *sig = NULL;
    while (tok) {
        switch (col) {
        case 0: r->read_id = strdup(tok); break;
        case 1: r->read_group = (uint32_t)strtoul(tok, NULL, 10); break;
        case 2: r->digitisation = strtod(tok, NULL); break;
        case 3: r->offset = strtod(tok, NULL); break;
        case 4: r->range = strtod(tok, NULL); break;
        case 5: r->sampling_rate = strtod(tok, NULL); break;
        case 6: r->len_raw_signal = strtoull(tok, NULL, 10); break;
        case 7: sig = tok; break;
        default: break;
        }
        tok = strtok_r(NULL, "\t", &save);
        ++col;
    }
    if (col < 8 || !r->read_id || !sig) return -1;
    r->raw_signal = (int16_t *)malloc(r->len_raw_signal * sizeof(int16_t));
    uint64_t i = 0;
    char *ss = NULL;
    for (char *v = strtok_r(sig, ",", &ss); v && i < r->len_raw_signal;
         v = strtok_r(NULL, ",", &ss))
        r->raw_signal[i++] = (int16_t)strtol(v, NULL, 10);
    if (i != r->len_raw_signal) return -1;
    return 0;
}

int slow5_get_next(slow5_rec_t **rec, slow5_file_t *sp)
{
    if (!sp || !sp->fp) return SLOW5_ERR_EOF;
    char *line = NULL;
    size_t cap = 0;
    ssize_t n;
    while ((n = getline(&line, &cap, sp->fp)) >= 0) {
        if (n == 0 || line[0] == '#' || line[0] == '@' || line[0] == '\n')
            continue;
        if (line[n - 1] == '\n') line[n - 1] = 0;
        if (!*rec) *rec = (slow5_rec_t *)calloc(1, sizeof(slow5_rec_t));
        else rec_clear(*rec);
        int ok = parse_line(line, *rec);
        free(line);
        return ok == 0 ? 0 : SLOW5_ERR_EOF;
    }
    free(line);
    return SLOW5_ERR_EOF;
}

void slow5_rec_free(slow5_rec_t *rec)
{
    if (!rec) return;
    rec_clear(rec);
    free(rec);
}

slow5_mt_t *slow5_init_mt(int n_threads, slow5_file_t *fp)
{
    (void)n_threads;
    slow5_mt_t *mt = (slow5_mt_t *)calloc(1, sizeof(slow5_mt_t));
    mt->fp = fp;
    return mt;
}

slow5_batch_t *slow5_init_batch(int capacity)
{
    slow5_batch_t *b = (slow5_batch_t *)calloc(1, sizeof(slow5_batch_t));
    b->capacity = capacity;
    b->slow5_rec = (slow5_rec_t **)calloc(capacity, sizeof(slow5_rec_t *));
    return b;
}

int slow5_get_next_batch(slow5_mt_t *mt, slow5_batch_t *batch, int n)
{
    if (n > batch->capacity) n = batch->capacity;
    int got = 0;
    while (got < n) {
        if (slow5_get_next(&batch->slow5_rec[got], mt->fp) < 0) break;
        ++got;
    }
    batch->n = got;
    return got;
}

void slow5_free_batch(slow5_batch_t *b)
{
    if (!b) return;
    for (int i = 0; i < b->capacity; ++i)
        if (b->slow5_rec[i]) slow5_rec_free(b->slow5_rec[i]);
    free(b->slow5_rec);
    free(b);
}

void slow5_free_mt(slow5_mt_t *mt) { free(mt); }
