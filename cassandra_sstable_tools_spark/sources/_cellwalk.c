/* C structure-walk kernel for the Data.db partition-block decoder.
 *
 * Exact mirror of data_cells.decode_partition_block's byte walk (the
 * Apache Cassandra 3.0+ "big" format unfiltered stream -- public wire
 * format, see data_cells.py's module docstring): same reads, same bounds
 * checks, same error conditions AT THE SAME BYTE OFFSETS.  The kernel
 * only walks structure and emits COLUMNAR arrays (numbers, flags, and
 * arena offsets for byte slices); all display rendering (partition keys,
 * clustering values, cell paths) and Arrow assembly stay in Python
 * (sources/cellwalk.py), which also maps the error codes below to the
 * byte-identical ValueError messages of the Python kernel.
 *
 * Ownership: one Ctx per scan task, malloc-grown arrays, freed by the
 * Python wrapper.  On any error the task raises and the Ctx is freed --
 * no rollback needed.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ---- flags (data_cells.py) ------------------------------------------- */
#define END_OF_PARTITION 0x01
#define IS_MARKER 0x02
#define HAS_TIMESTAMP 0x04
#define HAS_TTL 0x08
#define HAS_DELETION 0x10
#define HAS_ALL_COLUMNS 0x20
#define HAS_COMPLEX_DELETION 0x40
#define EXTENSION_FLAG 0x80
#define IS_STATIC 0x01
#define HAS_SHADOWABLE_DELETION 0x02
#define CELL_IS_DELETED 0x01
#define CELL_IS_EXPIRING 0x02
#define CELL_HAS_EMPTY_VALUE 0x04
#define CELL_USE_ROW_TIMESTAMP 0x08
#define CELL_USE_ROW_TTL 0x10

/* ClusteringPrefix.Kind ordinals */
#define K_EXCL_END 0
#define K_INCL_START 1
#define K_EE_IS_BOUNDARY 2
#define K_STATIC 3
#define K_CLUSTERING 4
#define K_IE_ES_BOUNDARY 5
#define K_INCL_END 6
#define K_EXCL_START 7

#define LIVE_LDT 2147483647LL
#define LIVE_MFDA INT64_MIN

/* record kind codes (cellwalk.py maps to the kind strings) */
#define KC_CELL 0
#define KC_STATIC_CELL 1
#define KC_ROW_MARKER 2
#define KC_ROW_DELETE 3
#define KC_RTM 4
#define KC_PARTITION_DELETE 5
#define KC_COMPLEX_DELETE 6

/* error codes (cellwalk.py maps to the exact Python messages) */
#define E_OK 0
#define E_READ_N 1      /* "read of {p0} bytes runs past partition block end" */
#define E_VINT 2        /* "vint runs past partition block end" */
#define E_CLUST_LEN 3   /* "implausible clustering value length {p0}" */
#define E_PATH_LEN 4    /* "implausible cell path length {p0}" */
#define E_VALUE_LEN 5   /* "implausible cell value length {p0}" */
#define E_GUARD 6       /* "unfiltered stream exceeds 1e8 entries" */
#define E_ARITY 7       /* "bound arity {p0} exceeds {p1} clustering columns" */
#define E_TWO_OPEN 8    /* "two open range-tombstone bounds in a row" */
#define E_CLOSE_NO_OPEN 9 /* "close range-tombstone bound without an open" */
#define E_BOUND_KIND 10 /* "unexpected bound kind ordinal {p0}" */
#define E_MARKER_OVERRUN 11 /* "marker body overran its declared size" */
#define E_SHADOWABLE 12 /* "shadowable deletions are out of scope" */
#define E_SUPERSET64 13 /* "column supersets >= 64 are out of scope" */
#define E_BITMAP 14     /* "column subset bitmap {p0:#x} wider than header" */
#define E_COMPLEX_COUNT 15 /* "implausible complex cell count {p0}" */
#define E_ROW_OVERRUN 16   /* "row body overran its declared size" */
#define E_UNCLOSED 17      /* "partition ended with an unclosed range tombstone" */
#define E_OOM 18           /* kernel out of memory (wrapper falls back) */
#define E_TTL_OVERFLOW 19  /* ttl arithmetic overflow (wrapper falls back) */

typedef struct {
  int32_t fixed;      /* fixed value length, -1 variable */
  uint8_t is_complex; /* CellPath-addressed column */
  uint8_t is_counter;
} ColInfo;

typedef struct {
  int32_t code;
  int32_t block; /* index into the span's offsets array */
  int64_t off;   /* block-relative byte offset, Python r.off semantics */
  int64_t p0;
  int64_t p1;
} Err;

typedef struct {
  /* per-record columns */
  int64_t n, cap;
  uint8_t *kind;
  int32_t *col;   /* combined [regular..., static...] index, -1 none */
  int32_t *crow;  /* clustering rows-table index, -1 none */
  int32_t *srow;  /* RTM range_start bound row, -1 none */
  int32_t *erow;  /* RTM range_end bound row, -1 none */
  int64_t *wt;
  uint8_t *has_wt;
  int64_t *ttl;
  uint8_t *has_ttl;
  int64_t *ldt;
  uint8_t *has_ldt;
  uint8_t *flags; /* bit0 tombstone, bit1 expiring, bit2 counter */
  int64_t *cellv;
  uint8_t *has_cellv;
  int64_t *phys;
  uint8_t *has_phys;
  int64_t *vlen;
  uint8_t *has_vlen;
  int64_t *path_off; /* arena offset, -1 none */
  int32_t *path_len;
  int64_t *val_off; /* value arena offset, -1 null (keep_values only) */

  /* rows table: clustering/bound value tuples */
  int64_t rn, rcap;
  int64_t *row_first; /* first index into the vals arrays */
  int32_t *row_arity;

  /* clustering/bound values */
  int64_t vn, vcap;
  int64_t *cv_off; /* arena offset; -1 null (with cv_len -1), len 0 empty */
  int32_t *cv_len;

  /* per-block: key slices + record counts */
  int64_t bn, bcap;
  int64_t *key_off;
  int32_t *key_len;
  int64_t *blk_nrec;

  /* byte arena: keys + clustering values + cell paths */
  int64_t an, acap;
  uint8_t *arena;

  /* value-bytes arena (keep_values only), record-append order */
  int64_t wn, wcap;
  uint8_t *varena;

  /* partition-key arena: keys only, contiguous in block order (lets the
   * Python side build the key string column without per-key slicing) */
  int64_t kn, kcap;
  uint8_t *karena;

  int keep_values;
} Ctx;

/* ---- growable helpers -------------------------------------------------- */

static int grow(void **p, int64_t *cap, int64_t need, size_t elt) {
  if (need <= *cap) return 0;
  int64_t ncap = *cap ? *cap : 1024;
  while (ncap < need) ncap *= 2;
  void *np = realloc(*p, (size_t)ncap * elt);
  if (!np) return -1;
  *p = np;
  *cap = ncap;
  return 0;
}

#define GROW_REC(c, need)                                                     \
  do {                                                                        \
    int64_t cap0 = (c)->cap;                                                  \
    if ((need) > cap0) {                                                      \
      int64_t tmp;                                                            \
      tmp = cap0; if (grow((void **)&(c)->kind, &tmp, need, 1)) return E_OOM; \
      tmp = cap0; if (grow((void **)&(c)->col, &tmp, need, 4)) return E_OOM;  \
      tmp = cap0; if (grow((void **)&(c)->crow, &tmp, need, 4)) return E_OOM; \
      tmp = cap0; if (grow((void **)&(c)->srow, &tmp, need, 4)) return E_OOM; \
      tmp = cap0; if (grow((void **)&(c)->erow, &tmp, need, 4)) return E_OOM; \
      tmp = cap0; if (grow((void **)&(c)->wt, &tmp, need, 8)) return E_OOM;   \
      tmp = cap0; if (grow((void **)&(c)->has_wt, &tmp, need, 1)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->ttl, &tmp, need, 8)) return E_OOM;  \
      tmp = cap0; if (grow((void **)&(c)->has_ttl, &tmp, need, 1)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->ldt, &tmp, need, 8)) return E_OOM;  \
      tmp = cap0; if (grow((void **)&(c)->has_ldt, &tmp, need, 1)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->flags, &tmp, need, 1)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->cellv, &tmp, need, 8)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->has_cellv, &tmp, need, 1)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->phys, &tmp, need, 8)) return E_OOM; \
      tmp = cap0; if (grow((void **)&(c)->has_phys, &tmp, need, 1)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->vlen, &tmp, need, 8)) return E_OOM; \
      tmp = cap0; if (grow((void **)&(c)->has_vlen, &tmp, need, 1)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->path_off, &tmp, need, 8)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->path_len, &tmp, need, 4)) return E_OOM;\
      tmp = cap0; if (grow((void **)&(c)->val_off, &tmp, need, 8)) return E_OOM;\
      (c)->cap = tmp;                                                         \
    }                                                                         \
  } while (0)

static int arena_put(Ctx *c, const uint8_t *src, int64_t len, int64_t *off) {
  if (grow((void **)&c->arena, &c->acap, c->an + len, 1)) return -1;
  if (len) memcpy(c->arena + c->an, src, (size_t)len);
  *off = c->an;
  c->an += len;
  return 0;
}

static int varena_put(Ctx *c, const uint8_t *src, int64_t len, int64_t *off) {
  if (grow((void **)&c->varena, &c->wcap, c->wn + len, 1)) return -1;
  if (len) memcpy(c->varena + c->wn, src, (size_t)len);
  *off = c->wn;
  c->wn += len;
  return 0;
}

static int karena_put(Ctx *c, const uint8_t *src, int64_t len, int64_t *off) {
  if (grow((void **)&c->karena, &c->kcap, c->kn + len, 1)) return -1;
  if (len) memcpy(c->karena + c->kn, src, (size_t)len);
  *off = c->kn;
  c->kn += len;
  return 0;
}

/* ---- vint -------------------------------------------------------------- */

static uint8_t VINT_EXTRA[256];
static int vint_init_done = 0;

static void vint_init(void) {
  if (vint_init_done) return;
  for (int b = 0; b < 256; b++) {
    int extra = 0;
    for (int bit = 7; bit >= 0 && (b & (1 << bit)); bit--) extra++;
    VINT_EXTRA[b] = (uint8_t)extra;
  }
  vint_init_done = 1;
}

/* returns 0 ok / -1 truncated; on success advances *off */
static inline int rd_vint(const uint8_t *buf, int64_t blen, int64_t *off,
                          uint64_t *v) {
  int64_t o = *off;
  if (o >= blen) return -1;
  uint8_t first = buf[o];
  if (first < 0x80) {
    *v = first;
    *off = o + 1;
    return 0;
  }
  int extra = VINT_EXTRA[first];
  int64_t end = o + 1 + extra;
  if (end > blen) return -1;
  uint64_t acc = 0;
  for (int i = 0; i < extra; i++) acc = (acc << 8) | buf[o + 1 + i];
  if (extra < 8) acc |= ((uint64_t)(first & (0xFFu >> extra))) << (8 * extra);
  *v = acc;
  *off = end;
  return 0;
}

/* wrapping int64 add (the Python kernel's (v + m + 2^63) & U64 - 2^63) */
static inline int64_t wrap_add(int64_t a, int64_t b) {
  return (int64_t)((uint64_t)a + (uint64_t)b);
}

#define ERR(c_, o_, p0_, p1_)                                                 \
  do {                                                                        \
    err->code = (c_);                                                         \
    err->off = (o_);                                                          \
    err->p0 = (p0_);                                                          \
    err->p1 = (p1_);                                                          \
    return (c_);                                                              \
  } while (0)

#define RD_VINT_OR(v_, errcode_off_)                                          \
  do {                                                                        \
    if (rd_vint(buf, blen, &off, &(v_))) ERR(E_VINT, (errcode_off_), 0, 0);   \
  } while (0)

/* append one record with all-default fields; returns its index or -1 */
static inline int64_t rec_new(Ctx *c, uint8_t kind) {
  int64_t i = c->n;
  if (i + 1 > c->cap) {
    /* grown by caller via GROW_REC before calling; defensive */
    return -1;
  }
  c->kind[i] = kind;
  c->col[i] = -1;
  c->crow[i] = -1;
  c->srow[i] = -1;
  c->erow[i] = -1;
  c->wt[i] = 0;
  c->has_wt[i] = 0;
  c->ttl[i] = 0;
  c->has_ttl[i] = 0;
  c->ldt[i] = 0;
  c->has_ldt[i] = 0;
  c->flags[i] = 0;
  c->cellv[i] = 0;
  c->has_cellv[i] = 0;
  c->phys[i] = 0;
  c->has_phys[i] = 0;
  c->vlen[i] = 0;
  c->has_vlen[i] = 0;
  c->path_off[i] = -1;
  c->path_len[i] = -1;
  c->val_off[i] = -1;
  c->n = i + 1;
  return i;
}

/* decode clustering/bound values (mirror of _dec_clustering_fast): emits a
 * rows-table entry; returns E_OK or error code. */
static int dec_clustering(Ctx *c, const uint8_t *buf, int64_t blen,
                          int64_t *off_io, const int32_t *ct_fixed,
                          int32_t arity, int64_t *row_idx, Err *err) {
  int64_t off = *off_io;
  if (c->rn + 1 > c->rcap) {
    /* twin arrays share one cap: grow each from the OLD cap */
    int64_t t1 = c->rcap, t2 = c->rcap;
    if (grow((void **)&c->row_first, &t1, c->rn + 1, 8)) ERR(E_OOM, off, 0, 0);
    if (grow((void **)&c->row_arity, &t2, c->rn + 1, 4)) ERR(E_OOM, off, 0, 0);
    c->rcap = t1;
  }
  if (c->vn + arity > c->vcap) {
    int64_t t1 = c->vcap, t2 = c->vcap;
    if (grow((void **)&c->cv_off, &t1, c->vn + arity, 8)) ERR(E_OOM, off, 0, 0);
    if (grow((void **)&c->cv_len, &t2, c->vn + arity, 4)) ERR(E_OOM, off, 0, 0);
    c->vcap = t1;
  }
  int64_t first = c->vn;
  for (int32_t start = 0; start < arity; start += 32) {
    int32_t hi = arity < start + 32 ? arity : start + 32;
    uint64_t header;
    if (rd_vint(buf, blen, &off, &header)) ERR(E_VINT, off, 0, 0);
    for (int32_t i = start; i < hi; i++) {
      int bit = (i - start) * 2;
      if (header & (2ull << bit)) { /* null */
        c->cv_off[c->vn] = -1;
        c->cv_len[c->vn] = -1;
        c->vn++;
      } else if (header & (1ull << bit)) { /* empty */
        c->cv_off[c->vn] = 0;
        c->cv_len[c->vn] = 0;
        c->vn++;
      } else {
        int64_t nlen;
        if (ct_fixed[i] < 0) {
          uint64_t nv;
          if (rd_vint(buf, blen, &off, &nv)) ERR(E_VINT, off, 0, 0);
          if (nv > (1ull << 24)) ERR(E_CLUST_LEN, off, (int64_t)nv, 0);
          nlen = (int64_t)nv;
        } else {
          nlen = ct_fixed[i];
        }
        if (off + nlen > blen) ERR(E_READ_N, off, nlen, 0);
        int64_t aoff;
        if (arena_put(c, buf + off, nlen, &aoff)) ERR(E_OOM, off, 0, 0);
        c->cv_off[c->vn] = aoff;
        c->cv_len[c->vn] = (int32_t)nlen;
        c->vn++;
        off += nlen;
      }
    }
  }
  c->row_first[c->rn] = first;
  c->row_arity[c->rn] = arity;
  *row_idx = c->rn;
  c->rn++;
  *off_io = off;
  return E_OK;
}

/* parse one cell (mirror of _parse_cell). *cell_span_sum accumulates this
 * row's cell spans for the phys overhead rule. */
static int parse_cell(Ctx *c, const uint8_t *buf, int64_t blen,
                      int64_t *off_io, int32_t col_idx, const ColInfo *ci,
                      int is_complex, int has_live_ts, int64_t live_ts,
                      int has_live_ttl, int64_t live_ttl, int has_live_ldt,
                      int64_t live_ldt, int64_t min_ts, int64_t min_ldt,
                      int64_t min_ttl, uint8_t row_kind, int64_t crow_idx,
                      int64_t *cell_span_sum, Err *err) {
  int64_t off = *off_io;
  int64_t cell_start = off;
  if (off >= blen) ERR(E_READ_N, off, 1, 0);
  uint8_t cflags = buf[off];
  off += 1;
  int64_t c_ts = 0;
  int has_c_ts = 0;
  if (cflags & CELL_USE_ROW_TIMESTAMP) {
    c_ts = live_ts;
    has_c_ts = has_live_ts;
  } else {
    uint64_t v;
    RD_VINT_OR(v, off);
    c_ts = wrap_add((int64_t)v, min_ts);
    has_c_ts = 1;
  }
  int deleted = (cflags & CELL_IS_DELETED) != 0;
  int expiring = (cflags & CELL_IS_EXPIRING) != 0;
  int64_t c_ldt = 0, c_ttl = 0;
  int has_c_ldt = 0, has_c_ttl = 0;
  if ((deleted || expiring) && !(cflags & CELL_USE_ROW_TTL)) {
    uint64_t v;
    RD_VINT_OR(v, off);
    c_ldt = wrap_add((int64_t)v, min_ldt);
    has_c_ldt = 1;
  }
  if (expiring && !(cflags & CELL_USE_ROW_TTL)) {
    uint64_t v;
    RD_VINT_OR(v, off);
    /* Python computes v + min_ttl with unbounded ints (no wrap mask);
     * overflow would surface later as a loud Arrow conversion error in
     * BOTH paths -- on C overflow fall back to the Python kernel so the
     * error text matches exactly. */
    if (__builtin_add_overflow((int64_t)v, min_ttl, &c_ttl))
      ERR(E_TTL_OVERFLOW, off, 0, 0);
    has_c_ttl = 1;
  }
  if (cflags & CELL_USE_ROW_TTL) {
    c_ldt = live_ldt;
    has_c_ldt = has_live_ldt;
    c_ttl = live_ttl;
    has_c_ttl = has_live_ttl;
  }
  int64_t poff = -1;
  int32_t plen = -1;
  if (is_complex) {
    uint64_t nv;
    RD_VINT_OR(nv, off);
    if (nv > (1ull << 24)) ERR(E_PATH_LEN, off, (int64_t)nv, 0);
    int64_t n = (int64_t)nv;
    if (off + n > blen) ERR(E_READ_N, off, n, 0);
    if (arena_put(c, buf + off, n, &poff)) ERR(E_OOM, off, 0, 0);
    plen = (int32_t)n;
    off += n;
  }
  int has_value = 0;
  int64_t vstart = 0, vn = 0;
  if (!(cflags & CELL_HAS_EMPTY_VALUE)) {
    if (ci->fixed >= 0) {
      vn = ci->fixed;
    } else {
      uint64_t nv;
      RD_VINT_OR(nv, off);
      if (nv > (1ull << 28)) ERR(E_VALUE_LEN, off, (int64_t)nv, 0);
      vn = (int64_t)nv;
    }
    if (off + vn > blen) ERR(E_READ_N, off, vn, 0);
    vstart = off;
    has_value = 1;
    off += vn;
  }
  GROW_REC(c, c->n + 1);
  int64_t i = rec_new(c, row_kind);
  c->col[i] = col_idx;
  c->crow[i] = (int32_t)crow_idx;
  c->wt[i] = c_ts;
  c->has_wt[i] = (uint8_t)has_c_ts;
  c->ttl[i] = c_ttl;
  c->has_ttl[i] = (uint8_t)has_c_ttl;
  c->ldt[i] = c_ldt;
  c->has_ldt[i] = (uint8_t)has_c_ldt;
  c->flags[i] = (uint8_t)((deleted ? 1 : 0) | (expiring ? 2 : 0) |
                          (ci->is_counter ? 4 : 0));
  if (has_value && vn == 8) {
    uint64_t acc = 0;
    for (int k = 0; k < 8; k++) acc = (acc << 8) | buf[vstart + k];
    c->cellv[i] = (int64_t)acc;
    c->has_cellv[i] = 1;
  }
  c->phys[i] = off - cell_start;
  c->has_phys[i] = 1;
  if (has_value) {
    c->vlen[i] = vn;
    c->has_vlen[i] = 1;
  }
  c->path_off[i] = poff;
  c->path_len[i] = plen;
  if (c->keep_values && has_value) {
    int64_t woff;
    if (varena_put(c, buf + vstart, vn, &woff)) ERR(E_OOM, off, 0, 0);
    c->val_off[i] = woff;
  }
  *cell_span_sum += off - cell_start;
  *off_io = off;
  return E_OK;
}

/* ---- one partition block ----------------------------------------------- */

static int walk_block(Ctx *c, const uint8_t *buf, int64_t blen,
                      const ColInfo *cols, int32_t n_reg, int32_t n_sta,
                      const int32_t *ct_fixed, int32_t n_ct, int64_t min_ts,
                      int64_t min_ldt, int64_t min_ttl, Err *err) {
  int64_t off = 0;

  /* partition header: u16 klen + key + DeletionTime(i32 ldt, i64 mfda) */
  if (off + 2 > blen) ERR(E_READ_N, off, 2, 0);
  int64_t klen = ((int64_t)buf[off] << 8) | buf[off + 1];
  off += 2;
  if (off + klen > blen) ERR(E_READ_N, off, klen, 0);
  int64_t key_off;
  if (karena_put(c, buf + off, klen, &key_off)) ERR(E_OOM, off, 0, 0);
  off += klen;
  if (off + 12 > blen) ERR(E_READ_N, off, 12, 0);
  int32_t p_ldt = (int32_t)(((uint32_t)buf[off] << 24) |
                            ((uint32_t)buf[off + 1] << 16) |
                            ((uint32_t)buf[off + 2] << 8) | buf[off + 3]);
  uint64_t um = 0;
  for (int k = 0; k < 8; k++) um = (um << 8) | buf[off + 4 + k];
  int64_t p_mfda = (int64_t)um;
  off += 12;

  /* per-block bookkeeping */
  if (c->bn + 1 > c->bcap) {
    int64_t t1 = c->bcap, t2 = c->bcap, t3 = c->bcap;
    if (grow((void **)&c->key_off, &t1, c->bn + 1, 8)) ERR(E_OOM, off, 0, 0);
    if (grow((void **)&c->key_len, &t2, c->bn + 1, 4)) ERR(E_OOM, off, 0, 0);
    if (grow((void **)&c->blk_nrec, &t3, c->bn + 1, 8)) ERR(E_OOM, off, 0, 0);
    c->bcap = t1;
  }
  c->key_off[c->bn] = key_off;
  c->key_len[c->bn] = (int32_t)klen;
  int64_t blk_first_rec = c->n;

  if (!(p_ldt == LIVE_LDT && p_mfda == LIVE_MFDA)) {
    GROW_REC(c, c->n + 1);
    int64_t i = rec_new(c, KC_PARTITION_DELETE);
    c->wt[i] = p_mfda;
    c->has_wt[i] = 1;
    c->ldt[i] = p_ldt;
    c->has_ldt[i] = 1;
  }

  /* pending open range-tombstone bound */
  int have_open = 0;
  int64_t open_row = -1;
  int64_t open_mfda = 0, open_ldt = 0, open_span = 0;

  uint64_t guard = 0;
  for (;;) {
    guard += 1;
    if (guard > 100000000ull) ERR(E_GUARD, off, 0, 0);
    int64_t unf_start = off;
    if (off >= blen) ERR(E_READ_N, off, 1, 0);
    uint8_t flags = buf[off];
    off += 1;
    if (flags & END_OF_PARTITION) break;

    if (flags & IS_MARKER) {
      if (off >= blen) ERR(E_READ_N, off, 1, 0);
      uint8_t kind_ord = buf[off];
      off += 1;
      if (off + 2 > blen) ERR(E_READ_N, off, 2, 0);
      int32_t n_vals = (int32_t)(((uint32_t)buf[off] << 8) | buf[off + 1]);
      off += 2;
      if (n_vals > n_ct) ERR(E_ARITY, off, n_vals, n_ct);
      int64_t bound_row;
      int rc = dec_clustering(c, buf, blen, &off, ct_fixed, n_vals,
                              &bound_row, err);
      if (rc != E_OK) return rc;
      uint64_t body_size, prev_sz;
      RD_VINT_OR(body_size, off);
      RD_VINT_OR(prev_sz, off);
      (void)prev_sz;
      int64_t body_end = off + (int64_t)body_size;
      int64_t marker_span = body_end - unf_start;
      int is_boundary =
          (kind_ord == K_EE_IS_BOUNDARY || kind_ord == K_IE_ES_BOUNDARY);
      int is_open = (kind_ord == K_INCL_START || kind_ord == K_EXCL_START);
      int is_close = (kind_ord == K_INCL_END || kind_ord == K_EXCL_END);
      if (is_boundary) {
        uint64_t d0, d1, v, w;
        RD_VINT_OR(d0, off);
        RD_VINT_OR(d1, off);
        RD_VINT_OR(v, off);
        RD_VINT_OR(w, off);
        (void)d0;
        (void)d1;
        int64_t start_mfda = wrap_add((int64_t)v, min_ts);
        int64_t start_ldt = wrap_add((int64_t)w, min_ldt);
        if (have_open) {
          GROW_REC(c, c->n + 1);
          int64_t i = rec_new(c, KC_RTM);
          c->wt[i] = open_mfda;
          c->has_wt[i] = 1;
          c->ldt[i] = open_ldt;
          c->has_ldt[i] = 1;
          c->srow[i] = (int32_t)open_row;
          c->erow[i] = (int32_t)bound_row;
          c->phys[i] = open_span + marker_span;
          c->has_phys[i] = 1;
        }
        have_open = 1;
        open_row = bound_row;
        open_mfda = start_mfda;
        open_ldt = start_ldt;
        open_span = 0;
      } else if (is_open) {
        uint64_t v, w;
        RD_VINT_OR(v, off);
        RD_VINT_OR(w, off);
        int64_t mfda = wrap_add((int64_t)v, min_ts);
        int64_t ldt = wrap_add((int64_t)w, min_ldt);
        if (have_open) ERR(E_TWO_OPEN, off, 0, 0);
        have_open = 1;
        open_row = bound_row;
        open_mfda = mfda;
        open_ldt = ldt;
        open_span = marker_span;
      } else if (is_close) {
        uint64_t v, w;
        RD_VINT_OR(v, off);
        RD_VINT_OR(w, off);
        (void)v;
        (void)w;
        if (!have_open) ERR(E_CLOSE_NO_OPEN, off, 0, 0);
        GROW_REC(c, c->n + 1);
        int64_t i = rec_new(c, KC_RTM);
        c->wt[i] = open_mfda;
        c->has_wt[i] = 1;
        c->ldt[i] = open_ldt;
        c->has_ldt[i] = 1;
        c->srow[i] = (int32_t)open_row;
        c->erow[i] = (int32_t)bound_row;
        c->phys[i] = open_span + marker_span;
        c->has_phys[i] = 1;
        have_open = 0;
      } else {
        ERR(E_BOUND_KIND, off, kind_ord, 0);
      }
      if (off > body_end) ERR(E_MARKER_OVERRUN, off, 0, 0);
      off = body_end;
      continue;
    }

    /* ROW */
    int is_static = 0;
    if (flags & EXTENSION_FLAG) {
      if (off >= blen) ERR(E_READ_N, off, 1, 0);
      uint8_t ext = buf[off];
      off += 1;
      if (ext & HAS_SHADOWABLE_DELETION) ERR(E_SHADOWABLE, off, 0, 0);
      is_static = (ext & IS_STATIC) != 0;
    }
    int64_t crow_idx = -1;
    if (!is_static) {
      int rc = dec_clustering(c, buf, blen, &off, ct_fixed, n_ct, &crow_idx,
                              err);
      if (rc != E_OK) return rc;
    }
    uint64_t body_size, prev_sz;
    RD_VINT_OR(body_size, off);
    RD_VINT_OR(prev_sz, off);
    (void)prev_sz;
    int64_t body_end = off + (int64_t)body_size;
    int64_t live_ts = 0, live_ttl = 0, live_ldt = 0;
    int has_live_ts = 0, has_live_ttl = 0, has_live_ldt = 0;
    if (flags & HAS_TIMESTAMP) {
      uint64_t v;
      RD_VINT_OR(v, off);
      live_ts = wrap_add((int64_t)v, min_ts);
      has_live_ts = 1;
    }
    if (flags & HAS_TTL) {
      uint64_t v, w;
      RD_VINT_OR(v, off);
      RD_VINT_OR(w, off);
      if (__builtin_add_overflow((int64_t)v, min_ttl, &live_ttl))
        ERR(E_TTL_OVERFLOW, off, 0, 0);
      has_live_ttl = 1;
      live_ldt = wrap_add((int64_t)w, min_ldt);
      has_live_ldt = 1;
    }
    int has_row_del = 0;
    int64_t rd_mfda = 0, rd_ldt = 0;
    if (flags & HAS_DELETION) {
      uint64_t v, w;
      RD_VINT_OR(v, off);
      RD_VINT_OR(w, off);
      rd_mfda = wrap_add((int64_t)v, min_ts);
      rd_ldt = wrap_add((int64_t)w, min_ldt);
      has_row_del = 1;
    }
    int32_t n_cols = is_static ? n_sta : n_reg;
    int32_t col_base = is_static ? n_reg : 0;
    uint64_t absent_bitmap = 0; /* bit i set = column i absent */
    if (!(flags & HAS_ALL_COLUMNS)) {
      if (n_cols >= 64) ERR(E_SUPERSET64, off, 0, 0);
      uint64_t bitmap;
      RD_VINT_OR(bitmap, off);
      if (bitmap != 0) {
        if (n_cols < 64 && (bitmap >> n_cols)) ERR(E_BITMAP, off, (int64_t)bitmap, 0);
        absent_bitmap = bitmap;
      }
    }
    int64_t n_cells = 0;
    int64_t row_first_rec = c->n;
    int64_t cell_span_sum = 0;
    uint8_t row_kind = is_static ? KC_STATIC_CELL : KC_CELL;

    for (int32_t idx = 0; idx < n_cols; idx++) {
      if (absent_bitmap & (1ull << idx)) continue;
      const ColInfo *ci = &cols[col_base + idx];
      if (!ci->is_complex) {
        int rc = parse_cell(c, buf, blen, &off, col_base + idx, ci, 0,
                            has_live_ts, live_ts, has_live_ttl, live_ttl,
                            has_live_ldt, live_ldt, min_ts, min_ldt, min_ttl,
                            row_kind, crow_idx, &cell_span_sum, err);
        if (rc != E_OK) return rc;
        n_cells += 1;
        continue;
      }
      /* complex column block */
      int64_t blk_start = off;
      if (flags & HAS_COMPLEX_DELETION) {
        uint64_t v, w;
        RD_VINT_OR(v, off);
        RD_VINT_OR(w, off);
        int64_t cd_mfda = wrap_add((int64_t)v, min_ts);
        int64_t cd_ldt = wrap_add((int64_t)w, min_ldt);
        if (!(cd_ldt == LIVE_LDT && cd_mfda == LIVE_MFDA)) {
          GROW_REC(c, c->n + 1);
          int64_t i = rec_new(c, KC_COMPLEX_DELETE);
          c->crow[i] = (int32_t)crow_idx;
          c->col[i] = col_base + idx;
          c->wt[i] = cd_mfda;
          c->has_wt[i] = 1;
          c->ldt[i] = cd_ldt;
          c->has_ldt[i] = 1;
          c->flags[i] = 1; /* is_tombstone */
          c->phys[i] = off - blk_start;
          c->has_phys[i] = 1;
          cell_span_sum += off - blk_start;
        }
      }
      uint64_t col_cells;
      RD_VINT_OR(col_cells, off);
      if (col_cells > (1ull << 24)) ERR(E_COMPLEX_COUNT, off, (int64_t)col_cells, 0);
      for (uint64_t k = 0; k < col_cells; k++) {
        int rc = parse_cell(c, buf, blen, &off, col_base + idx, ci, 1,
                            has_live_ts, live_ts, has_live_ttl, live_ttl,
                            has_live_ldt, live_ldt, min_ts, min_ldt, min_ttl,
                            row_kind, crow_idx, &cell_span_sum, err);
        if (rc != E_OK) return rc;
        n_cells += 1;
      }
    }
    if (n_cells == 0) {
      if (has_row_del) {
        GROW_REC(c, c->n + 1);
        int64_t i = rec_new(c, KC_ROW_DELETE);
        c->crow[i] = (int32_t)crow_idx;
        c->wt[i] = rd_mfda;
        c->has_wt[i] = 1;
        c->ldt[i] = rd_ldt;
        c->has_ldt[i] = 1;
      } else if (has_live_ts) {
        GROW_REC(c, c->n + 1);
        int64_t i = rec_new(c, KC_ROW_MARKER);
        c->crow[i] = (int32_t)crow_idx;
        c->wt[i] = live_ts;
        c->has_wt[i] = 1;
        c->ttl[i] = live_ttl;
        c->has_ttl[i] = (uint8_t)has_live_ttl;
        c->ldt[i] = live_ldt;
        c->has_ldt[i] = (uint8_t)has_live_ldt;
      }
    } else if (has_row_del) {
      GROW_REC(c, c->n + 1);
      int64_t i = rec_new(c, KC_ROW_DELETE);
      c->crow[i] = (int32_t)crow_idx;
      c->wt[i] = rd_mfda;
      c->has_wt[i] = 1;
      c->ldt[i] = rd_ldt;
      c->has_ldt[i] = 1;
    }
    if (off > body_end) ERR(E_ROW_OVERRUN, off, 0, 0);
    off = body_end;
    /* phys_size attribution (decode_partition_block docstring) */
    int64_t n_row_recs = c->n - row_first_rec;
    int64_t unf_span = body_end - unf_start;
    if (n_row_recs == 1) {
      c->phys[row_first_rec] = unf_span;
      c->has_phys[row_first_rec] = 1;
    } else if (n_row_recs > 0) {
      int64_t overhead = unf_span - cell_span_sum;
      int64_t last = c->n - 1;
      if (c->kind[last] == KC_ROW_DELETE) {
        c->phys[last] = overhead;
        c->has_phys[last] = 1;
      } else {
        c->phys[row_first_rec] =
            (c->has_phys[row_first_rec] ? c->phys[row_first_rec] : 0) +
            overhead;
        c->has_phys[row_first_rec] = 1;
      }
    }
  }
  if (have_open) ERR(E_UNCLOSED, off, 0, 0);
  c->blk_nrec[c->bn] = c->n - blk_first_rec;
  c->bn += 1;
  return E_OK;
}

/* ---- public API --------------------------------------------------------- */

Ctx *cellwalk_new(int keep_values) {
  vint_init();
  Ctx *c = (Ctx *)calloc(1, sizeof(Ctx));
  if (c) c->keep_values = keep_values;
  return c;
}

void cellwalk_free(Ctx *c) {
  if (!c) return;
  free(c->kind);
  free(c->col);
  free(c->crow);
  free(c->srow);
  free(c->erow);
  free(c->wt);
  free(c->has_wt);
  free(c->ttl);
  free(c->has_ttl);
  free(c->ldt);
  free(c->has_ldt);
  free(c->flags);
  free(c->cellv);
  free(c->has_cellv);
  free(c->phys);
  free(c->has_phys);
  free(c->vlen);
  free(c->has_vlen);
  free(c->path_off);
  free(c->path_len);
  free(c->val_off);
  free(c->row_first);
  free(c->row_arity);
  free(c->cv_off);
  free(c->cv_len);
  free(c->key_off);
  free(c->key_len);
  free(c->blk_nrec);
  free(c->arena);
  free(c->varena);
  free(c->karena);
  free(c);
}

/* Walk every block of a span. offsets/ends are span-relative block
 * boundaries (caller pre-filters zero-extent blocks). On error fills
 * *err (err->block = failing block index) and returns its code. */
int cellwalk_span(Ctx *c, const uint8_t *span, const int64_t *offsets,
                  const int64_t *ends, int32_t n_blocks, const ColInfo *cols,
                  int32_t n_reg, int32_t n_sta, const int32_t *ct_fixed,
                  int32_t n_ct, int64_t min_ts, int64_t min_ldt,
                  int64_t min_ttl, Err *err) {
  for (int32_t b = 0; b < n_blocks; b++) {
    err->block = b;
    int rc = walk_block(c, span + offsets[b], ends[b] - offsets[b], cols,
                        n_reg, n_sta, ct_fixed, n_ct, min_ts, min_ldt,
                        min_ttl, err);
    if (rc != E_OK) return rc;
  }
  err->code = E_OK;
  return E_OK;
}

/* ---- finalize accessors (ctypes reads struct fields directly) ---------- */

int64_t cellwalk_n(Ctx *c) { return c->n; }
