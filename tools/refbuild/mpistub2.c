/* Mini-MPI for TWO ranks over socketpairs: MPI_Init forks rank 1; all
 * point-to-point and collective traffic runs on a full-duplex UNIX
 * socket with tag-matched framing.  Just enough MPI-1 for the
 * reference's TTM+TMM build; the "missing fake backend" (SURVEY §4). */
#include "mpi.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <execinfo.h>

static int my_rank = 0, n_ranks = 1;
static int sock = -1;               /* to the peer */

/* ---- datatype extents ---------------------------------------------- */
#define MAXT 256
static long dt_extent[MAXT];
static int dt_n = 0;

static long extent_of(MPI_Datatype t) {
    if (t >= 1000) return dt_extent[t - 1000];
    if (t == MPI_FLOAT) return 4;
    if (t == MPI_DOUBLE) return 8;
    if (t == MPI_LB || t == MPI_UB) return 0;
    return t;
}
static MPI_Datatype new_dt(long extent) {
    if (dt_n >= MAXT) { fprintf(stderr, "shim: dt table full\n"); exit(1); }
    dt_extent[dt_n] = extent;
    return 1000 + dt_n++;
}
int MPI_Type_contiguous(int c, MPI_Datatype o, MPI_Datatype *n)
{ *n = new_dt((long)c * extent_of(o)); return 0; }
int MPI_Type_vector(int c, int bl, int s, MPI_Datatype o, MPI_Datatype *n)
{ *n = new_dt(((long)(c - 1) * s + bl) * extent_of(o)); return 0; }
int MPI_Type_struct(int c, int *bc, MPI_Aint *d, MPI_Datatype *t,
                    MPI_Datatype *n) {
    long ext = 0; int i, ub = 0;
    for (i = 0; i < c; i++)
        if (t[i] == MPI_UB) { ext = d[i]; ub = 1; break; }
    if (!ub) for (i = 0; i < c; i++) {
        long e = d[i] + (long)bc[i] * extent_of(t[i]);
        if (e > ext) ext = e;
    }
    *n = new_dt(ext); return 0;
}
int MPI_Type_commit(MPI_Datatype *t) { (void)t; return 0; }
int MPI_Type_extent(MPI_Datatype t, MPI_Aint *e) { *e = extent_of(t); return 0; }
int MPI_Type_size(MPI_Datatype t, int *s) { *s = (int)extent_of(t); return 0; }
int MPI_Address(const void *p, MPI_Aint *a) { *a = (MPI_Aint)p; return 0; }
int MPI_Get_count(MPI_Status *st, MPI_Datatype t, int *c)
{ long e = extent_of(t); *c = st ? (int)(st->count_bytes / (e ? e : 1)) : 0;
  return 0; }
int MPI_Alloc_mem(MPI_Aint s, MPI_Info i, void *p)
{ (void)i; *(void **)p = malloc(s); return 0; }
int MPI_Free_mem(void *b) { free(b); return 0; }

/* ---- wire helpers --------------------------------------------------- */
static void wr_all(const void *b, size_t n) {
    const char *p = b;
    while (n) { ssize_t k = write(sock, p, n);
        if (k <= 0) { perror("shim write"); exit(1); }
        p += k; n -= k; }
}
static void rd_all(void *b, size_t n) {
    char *p = b;
    while (n) { ssize_t k = read(sock, p, n);
        if (k <= 0) { perror("shim read"); exit(1); }
        p += k; n -= k; }
}

static void send_msg(int tag, const void *buf, long bytes) {
    long hdr[2] = {tag, bytes};
    wr_all(hdr, sizeof hdr);
    if (bytes) wr_all(buf, bytes);
}

/* out-of-order queue for tag matching */
typedef struct { int tag; long bytes; void *data; int live; } Msg;
#define MAXQ 256
static Msg q[MAXQ];

static void q_store(int tag, void *data, long bytes) {
    int i;
    for (i = 0; i < MAXQ; i++) if (!q[i].live) {
        q[i].tag = tag; q[i].data = data; q[i].bytes = bytes; q[i].live = 1;
        return;
    }
    fprintf(stderr, "shim: ooo queue full\n"); exit(1);
}

static long recv_msg(int tag, void *buf, long maxbytes, int *src_tag) {
    int i;
    for (i = 0; i < MAXQ; i++) if (q[i].live &&
            (tag == MPI_ANY_TAG || q[i].tag == tag)) {
        long n = q[i].bytes < maxbytes ? q[i].bytes : maxbytes;
        memcpy(buf, q[i].data, n);
        if (src_tag) *src_tag = q[i].tag;
        free(q[i].data); q[i].live = 0;
        return n;
    }
    for (;;) {
        long hdr[2]; rd_all(hdr, sizeof hdr);
        if (tag == MPI_ANY_TAG || hdr[0] == tag) {
            long n = hdr[1] < maxbytes ? hdr[1] : maxbytes;
            rd_all(buf, n);
            if (hdr[1] > n) {        /* drain excess */
                char sink[4096]; long left = hdr[1] - n;
                while (left) { long k = left < 4096 ? left : 4096;
                    rd_all(sink, k); left -= k; }
            }
            if (src_tag) *src_tag = (int)hdr[0];
            return n;
        }
        { void *d = malloc(hdr[1] ? hdr[1] : 1);
          rd_all(d, hdr[1]);
          q_store((int)hdr[0], d, hdr[1]); }
    }
}

/* ---- env ------------------------------------------------------------ */
int MPI_Init(int *argc, char ***argv) {
    int sv[2];
    (void)argc; (void)argv;
    if (getenv("SHIM_NRANKS") && atoi(getenv("SHIM_NRANKS")) == 1) {
        n_ranks = 1; my_rank = 0; return 0;
    }
    if (socketpair(AF_UNIX, SOCK_STREAM, 0, sv)) { perror("socketpair");
        exit(1); }
    n_ranks = 2;
    if (fork() == 0) { my_rank = 1; sock = sv[1]; close(sv[0]); }
    else             { my_rank = 0; sock = sv[0]; close(sv[1]); }
    return 0;
}
int MPI_Init_thread(int *argc, char ***argv, int req, int *prov)
{ (void)req; *prov = MPI_THREAD_FUNNELED; return MPI_Init(argc, argv); }
int MPI_Finalize(void) {
    if (my_rank == 0 && n_ranks == 2) { int st; wait(&st); }
    return 0;
}
int MPI_Abort(MPI_Comm c, int code) {
    void *bt[32]; int n = backtrace(bt, 32);
    (void)c;
    fprintf(stderr, "--- shim backtrace (rank %d) ---\n", my_rank);
    backtrace_symbols_fd(bt, n, 2);
    exit(code);
}
int MPI_Comm_rank(MPI_Comm c, int *r) { (void)c; *r = my_rank; return 0; }
int MPI_Comm_size(MPI_Comm c, int *s) { (void)c; *s = n_ranks; return 0; }
double MPI_Wtime(void) {
    struct timeval tv; gettimeofday(&tv, NULL);
    return tv.tv_sec + 1e-6 * tv.tv_usec;
}

#define TAG_COLL  (1 << 28)
int MPI_Barrier(MPI_Comm c) {
    (void)c;
    if (n_ranks == 1) return 0;
    { char t = 1; send_msg(TAG_COLL + 1, &t, 1);
      recv_msg(TAG_COLL + 1, &t, 1, NULL); }
    return 0;
}

/* ---- cartesian ------------------------------------------------------ */
int MPI_Cart_create(MPI_Comm o, int nd, int *dims, int *per, int re,
                    MPI_Comm *c)
{ (void)o; (void)nd; (void)dims; (void)per; (void)re; *c = 1; return 0; }
int MPI_Cart_rank(MPI_Comm c, int *coords, int *r)
{ (void)c; *r = coords[0]; return 0; }
int MPI_Cart_coords(MPI_Comm c, int r, int md, int *coords)
{ (void)c; { int i; for (i = 0; i < md; i++) coords[i] = 0; }
  coords[0] = r; return 0; }

/* ---- point-to-point ------------------------------------------------- */
int MPI_Send(const void *b, int cnt, MPI_Datatype t, int dest, int tag,
             MPI_Comm c) {
    (void)c;
    if (dest == MPI_PROC_NULL) return 0;
    if (dest == my_rank) { fprintf(stderr, "shim: self-send r%d t%d\n",
                                   my_rank, tag); exit(1); }
    send_msg(tag, b, (long)cnt * extent_of(t));
    return 0;
}
int MPI_Recv(void *b, int cnt, MPI_Datatype t, int src, int tag,
             MPI_Comm c, MPI_Status *st) {
    (void)c; (void)src;
    if (src == MPI_PROC_NULL) { if (st) st->count_bytes = 0; return 0; }
    { int rtag; long n = recv_msg(tag, b, (long)cnt * extent_of(t), &rtag);
      if (st) { st->MPI_SOURCE = 1 - my_rank; st->MPI_TAG = rtag;
                st->count_bytes = (int)n; } }
    return 0;
}
int MPI_Sendrecv(const void *sb, int sc, MPI_Datatype st_, int dest,
                 int stag, void *rb, int rc, MPI_Datatype rt, int src,
                 int rtag, MPI_Comm c, MPI_Status *st) {
    (void)c;
    if (dest != MPI_PROC_NULL) {
        long bytes = (long)sc * extent_of(st_);
        if (bytes > (1 << 20)) { fprintf(stderr,
            "shim: sendrecv >1MB would deadlock\n"); exit(1); }
        send_msg(stag, sb, bytes);
    }
    if (src != MPI_PROC_NULL) {
        int rt2; long n = recv_msg(rtag, rb, (long)rc * extent_of(rt), &rt2);
        if (st) { st->MPI_SOURCE = 1 - my_rank; st->MPI_TAG = rt2;
                  st->count_bytes = (int)n; }
    } else if (st) st->count_bytes = 0;
    return 0;
}

/* nonblocking: sends go out eagerly; recvs resolve at Wait time */
typedef struct { void *buf; long bytes; int tag; int live; } Pend;
static Pend pend[MAXQ];
static int pend_new(void *buf, long bytes, int tag) {
    int i;
    for (i = 0; i < MAXQ; i++) if (!pend[i].live) {
        pend[i].buf = buf; pend[i].bytes = bytes; pend[i].tag = tag;
        pend[i].live = 1; return i;
    }
    fprintf(stderr, "shim: request table full\n"); exit(1);
}
int MPI_Isend(const void *b, int cnt, MPI_Datatype t, int dest, int tag,
              MPI_Comm c, MPI_Request *rq) {
    (void)c;
    if (dest == MPI_PROC_NULL) { *rq = -1; return 0; }
    { long bytes = (long)cnt * extent_of(t);
      if (bytes > (1 << 20)) { fprintf(stderr, "shim: isend >1MB\n");
                               exit(1); }
      send_msg(tag, b, bytes); }
    *rq = -1;
    return 0;
}
int MPI_Irecv(void *b, int cnt, MPI_Datatype t, int src, int tag,
              MPI_Comm c, MPI_Request *rq) {
    (void)c;
    if (src == MPI_PROC_NULL) { *rq = -1; return 0; }
    *rq = pend_new(b, (long)cnt * extent_of(t), tag);
    return 0;
}
static void resolve(MPI_Request r, MPI_Status *st) {
    if (r < 0) { if (st) st->count_bytes = 0; return; }
    { int rt; long n = recv_msg(pend[r].tag, pend[r].buf, pend[r].bytes, &rt);
      pend[r].live = 0;
      if (st) { st->MPI_SOURCE = 1 - my_rank; st->MPI_TAG = rt;
                st->count_bytes = (int)n; } }
}
int MPI_Waitall(int n, MPI_Request *rq, MPI_Status *sts) {
    int i;
    for (i = 0; i < n; i++) resolve(rq[i], sts ? &sts[i] : NULL);
    return 0;
}
int MPI_Waitany(int n, MPI_Request *rq, int *idx, MPI_Status *st) {
    int i;
    for (i = 0; i < n; i++) if (rq[i] >= 0) {
        *idx = i; resolve(rq[i], st); rq[i] = -1; return 0;
    }
    *idx = 0; if (st) st->count_bytes = 0;
    return 0;
}

/* ---- collectives ---------------------------------------------------- */
static void combine(void *mine, const void *theirs, int count,
                    MPI_Datatype t, MPI_Op op) {
    int i;
    if (t == MPI_DOUBLE) {
        double *a = mine; const double *b = theirs;
        for (i = 0; i < count; i++)
            a[i] = op == MPI_SUM ? a[i] + b[i]
                 : op == MPI_MAX ? (a[i] > b[i] ? a[i] : b[i])
                 : (a[i] < b[i] ? a[i] : b[i]);
    } else if (t == MPI_FLOAT) {
        float *a = mine; const float *b = theirs;
        for (i = 0; i < count; i++)
            a[i] = op == MPI_SUM ? a[i] + b[i]
                 : op == MPI_MAX ? (a[i] > b[i] ? a[i] : b[i])
                 : (a[i] < b[i] ? a[i] : b[i]);
    } else if (t == MPI_INT) {
        int *a = mine; const int *b = theirs;
        for (i = 0; i < count; i++)
            a[i] = op == MPI_SUM ? a[i] + b[i]
                 : op == MPI_MAX ? (a[i] > b[i] ? a[i] : b[i])
                 : (a[i] < b[i] ? a[i] : b[i]);
    } else if (t == MPI_LONG) {
        long *a = mine; const long *b = theirs;
        for (i = 0; i < count; i++)
            a[i] = op == MPI_SUM ? a[i] + b[i]
                 : op == MPI_MAX ? (a[i] > b[i] ? a[i] : b[i])
                 : (a[i] < b[i] ? a[i] : b[i]);
    } else { fprintf(stderr, "shim: reduce on derived type\n"); exit(1); }
}

int MPI_Allreduce(const void *s, void *r, int count, MPI_Datatype t,
                  MPI_Op op, MPI_Comm c) {
    (void)c;
    long bytes = (long)count * extent_of(t);
    if (s != r) memcpy(r, s, bytes);
    if (n_ranks == 1) return 0;
    send_msg(TAG_COLL + 2, r, bytes);
    { void *other = malloc(bytes);
      recv_msg(TAG_COLL + 2, other, bytes, NULL);
      combine(r, other, count, t, op);
      free(other); }
    if (my_rank == 0 && getenv("SHIM_DUMP") && count >= 8) {
        int i; fprintf(stderr, "[allreduce n=%d t=%d]", count, (int)t);
        for (i = 0; i < (count < 60 ? count : 60); i++) {
            if (t == MPI_DOUBLE) fprintf(stderr, " %.3g", ((double *)r)[i]);
            else if (t == MPI_INT) fprintf(stderr, " %d", ((int *)r)[i]);
        }
        fprintf(stderr, "\n");
    }
    return 0;
}
int MPI_Reduce(const void *s, void *r, int count, MPI_Datatype t,
               MPI_Op op, int root, MPI_Comm c) {
    (void)c;
    long bytes = (long)count * extent_of(t);
    if (n_ranks == 1) { if (s != r) memcpy(r, s, bytes); return 0; }
    if (my_rank == root) {
        if (s != r) memcpy(r, s, bytes);
        { void *other = malloc(bytes);
          recv_msg(TAG_COLL + 3, other, bytes, NULL);
          combine(r, other, count, t, op);
          free(other); }
    } else send_msg(TAG_COLL + 3, s, bytes);
    return 0;
}
int MPI_Bcast(void *b, int count, MPI_Datatype t, int root, MPI_Comm c) {
    (void)c;
    long bytes = (long)count * extent_of(t);
    if (n_ranks == 1) return 0;
    if (my_rank == root) send_msg(TAG_COLL + 4, b, bytes);
    else recv_msg(TAG_COLL + 4, b, bytes, NULL);
    return 0;
}
int MPI_Exscan(const void *s, void *r, int count, MPI_Datatype t,
               MPI_Op op, MPI_Comm c) {
    (void)c; (void)op;
    long bytes = (long)count * extent_of(t);
    if (n_ranks == 1) { memset(r, 0, bytes); return 0; }
    if (my_rank == 0) { send_msg(TAG_COLL + 5, s, bytes);
                        memset(r, 0, bytes); }
    else recv_msg(TAG_COLL + 5, r, bytes, NULL);
    return 0;
}
int MPI_Allgather(const void *s, int sc, MPI_Datatype st_, void *r,
                  int rc, MPI_Datatype rt, MPI_Comm c) {
    (void)c; (void)rc; (void)rt;
    long bytes = (long)sc * extent_of(st_);
    memcpy((char *)r + my_rank * bytes, s, bytes);
    if (n_ranks == 1) return 0;
    send_msg(TAG_COLL + 6, s, bytes);
    recv_msg(TAG_COLL + 6, (char *)r + (1 - my_rank) * bytes, bytes, NULL);
    return 0;
}
int MPI_Gather(const void *s, int sc, MPI_Datatype st_, void *r,
               int rc, MPI_Datatype rt, int root, MPI_Comm c) {
    (void)c; (void)rc; (void)rt;
    long bytes = (long)sc * extent_of(st_);
    if (n_ranks == 1) { memcpy(r, s, bytes); return 0; }
    if (my_rank == root) {
        memcpy((char *)r + (long)root * bytes, s, bytes);
        recv_msg(TAG_COLL + 7, (char *)r + (long)(1 - root) * bytes,
                 bytes, NULL);
    } else send_msg(TAG_COLL + 7, s, bytes);
    return 0;
}
int MPI_Scatter(const void *s, int sc, MPI_Datatype st_, void *r,
                int rc, MPI_Datatype rt, int root, MPI_Comm c) {
    (void)c; (void)rc; (void)rt;
    long bytes = (long)sc * extent_of(st_);
    if (n_ranks == 1) { memcpy(r, s, bytes); return 0; }
    if (my_rank == root) {
        memcpy(r, (char *)s + (long)root * bytes, bytes);
        send_msg(TAG_COLL + 8, (char *)s + (long)(1 - root) * bytes, bytes);
    } else recv_msg(TAG_COLL + 8, r, bytes, NULL);
    return 0;
}

/* ---- MPI-IO: not linked in this build ------------------------------- */
int MPI_File_open(MPI_Comm c, const char *n, int m, MPI_Info i, MPI_File *f)
{ (void)c; (void)n; (void)m; (void)i; (void)f;
  fprintf(stderr, "shim: MPI-IO unsupported\n"); exit(1); }
int MPI_File_close(MPI_File *f) { (void)f; return 0; }
int MPI_File_set_view(MPI_File f, long d, MPI_Datatype e, MPI_Datatype t,
                      const char *rep, MPI_Info i)
{ (void)f; (void)d; (void)e; (void)t; (void)rep; (void)i; return 0; }
int MPI_File_write_all(MPI_File f, void *b, int c, MPI_Datatype t,
                       MPI_Status *s)
{ (void)f; (void)b; (void)c; (void)t; (void)s; return 0; }
int MPI_File_write_at(MPI_File f, long o, void *b, int c, MPI_Datatype t,
                      MPI_Status *s)
{ (void)f; (void)o; (void)b; (void)c; (void)t; (void)s; return 0; }
