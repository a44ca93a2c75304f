/* Minimal single-rank MPI-1 shim for building the reference serially.
 * Collectives degenerate to memcpy; sends to self are buffered by tag;
 * derived datatypes only track extents (that is all a 1-rank run needs).
 */
#ifndef MPI_SHIM_H
#define MPI_SHIM_H
#include <stddef.h>

typedef int MPI_Comm;
typedef int MPI_Op;
typedef int MPI_Info;
typedef int MPI_File;
typedef int MPI_Request;
typedef long MPI_Aint;
typedef int MPI_Datatype;
typedef struct { int MPI_SOURCE, MPI_TAG, MPI_ERROR; int count_bytes; } MPI_Status;

#define MPI_COMM_WORLD 0
#define MPI_SUCCESS 0
#define MPI_ANY_SOURCE (-1)
#define MPI_ANY_TAG (-1)
#define MPI_THREAD_FUNNELED 1
#define MPI_INFO_NULL 0
#define MPI_MODE_CREATE 1
#define MPI_MODE_WRONLY 2
#define MPI_PROC_NULL (-2)

/* basic datatypes: handle = encoded size; derived handles are >= 1000 */
#define MPI_CHAR    1
#define MPI_SHORT   2
#define MPI_INT     4
#define MPI_LONG    8
#define MPI_FLOAT   104
#define MPI_DOUBLE  108
#define MPI_LB      900
#define MPI_UB      901

#define MPI_SUM 1
#define MPI_MAX 2
#define MPI_MIN 3

int MPI_Init(int *argc, char ***argv);
int MPI_Init_thread(int *argc, char ***argv, int required, int *provided);
int MPI_Finalize(void);
int MPI_Abort(MPI_Comm comm, int code);
int MPI_Comm_rank(MPI_Comm comm, int *rank);
int MPI_Comm_size(MPI_Comm comm, int *size);
int MPI_Barrier(MPI_Comm comm);
double MPI_Wtime(void);

int MPI_Cart_create(MPI_Comm old, int ndims, int *dims, int *periods,
                    int reorder, MPI_Comm *comm);
int MPI_Cart_rank(MPI_Comm comm, int *coords, int *rank);
int MPI_Cart_coords(MPI_Comm comm, int rank, int maxdims, int *coords);

int MPI_Type_contiguous(int count, MPI_Datatype old, MPI_Datatype *newt);
int MPI_Type_vector(int count, int blocklen, int stride, MPI_Datatype old,
                    MPI_Datatype *newt);
int MPI_Type_struct(int count, int *blockcounts, MPI_Aint *displs,
                    MPI_Datatype *types, MPI_Datatype *newt);
int MPI_Type_commit(MPI_Datatype *t);
int MPI_Type_extent(MPI_Datatype t, MPI_Aint *extent);
int MPI_Type_size(MPI_Datatype t, int *size);
int MPI_Address(const void *p, MPI_Aint *a);
int MPI_Get_count(MPI_Status *st, MPI_Datatype t, int *count);

int MPI_Alloc_mem(MPI_Aint size, MPI_Info info, void *baseptr);
int MPI_Free_mem(void *base);

int MPI_Send(const void *buf, int count, MPI_Datatype t, int dest, int tag,
             MPI_Comm comm);
int MPI_Recv(void *buf, int count, MPI_Datatype t, int src, int tag,
             MPI_Comm comm, MPI_Status *st);
int MPI_Sendrecv(const void *sbuf, int scount, MPI_Datatype st_, int dest,
                 int stag, void *rbuf, int rcount, MPI_Datatype rt, int src,
                 int rtag, MPI_Comm comm, MPI_Status *st);
int MPI_Isend(const void *buf, int count, MPI_Datatype t, int dest, int tag,
              MPI_Comm comm, MPI_Request *req);
int MPI_Irecv(void *buf, int count, MPI_Datatype t, int src, int tag,
              MPI_Comm comm, MPI_Request *req);
int MPI_Waitall(int n, MPI_Request *reqs, MPI_Status *sts);
int MPI_Waitany(int n, MPI_Request *reqs, int *idx, MPI_Status *st);

int MPI_Bcast(void *buf, int count, MPI_Datatype t, int root, MPI_Comm comm);
int MPI_Reduce(const void *sbuf, void *rbuf, int count, MPI_Datatype t,
               MPI_Op op, int root, MPI_Comm comm);
int MPI_Allreduce(const void *sbuf, void *rbuf, int count, MPI_Datatype t,
                  MPI_Op op, MPI_Comm comm);
int MPI_Exscan(const void *sbuf, void *rbuf, int count, MPI_Datatype t,
               MPI_Op op, MPI_Comm comm);
int MPI_Allgather(const void *sbuf, int scount, MPI_Datatype st_, void *rbuf,
                  int rcount, MPI_Datatype rt, MPI_Comm comm);
int MPI_Gather(const void *sbuf, int scount, MPI_Datatype st_, void *rbuf,
               int rcount, MPI_Datatype rt, int root, MPI_Comm comm);
int MPI_Scatter(const void *sbuf, int scount, MPI_Datatype st_, void *rbuf,
                int rcount, MPI_Datatype rt, int root, MPI_Comm comm);

int MPI_File_open(MPI_Comm comm, const char *name, int mode, MPI_Info info,
                  MPI_File *fh);
int MPI_File_close(MPI_File *fh);
int MPI_File_set_view(MPI_File fh, long disp, MPI_Datatype etype,
                      MPI_Datatype ftype, const char *rep, MPI_Info info);
int MPI_File_write_all(MPI_File fh, void *buf, int count, MPI_Datatype t,
                       MPI_Status *st);
int MPI_File_write_at(MPI_File fh, long off, void *buf, int count,
                      MPI_Datatype t, MPI_Status *st);
#endif
