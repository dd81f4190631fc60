// Native runtime components for anyseq_tpu.
//
// TPU-native re-design of the reference's C++ host layer
// (src/sequence_io.cpp, src/traceback.impala:47-80): the compute path is
// JAX/Pallas; the host-side sequential pieces -- record parsing and the
// inherently serial traceback walks -- are native for speed. Exposed as a
// C ABI consumed via ctypes (anyseq_tpu/io/_native.py).
//
// Build: g++ -O2 -shared -fPIC -o libanyseq_native.so anyseq_native.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------
// FASTA/FASTQ first-record readers (reference: sequence_io.cpp:62-163,
// first-record-only semantics of main.cpp:182-189).
// Returns sequence length, -1 on open failure, -2 on format error,
// -3 if capacity insufficient (call again with a larger buffer).
// ---------------------------------------------------------------------
long read_first_fasta(const char* path, unsigned char* out, long cap) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    static const long BUF = 1 << 20;
    char* line = (char*)malloc(BUF);
    if (!fgets(line, BUF, f)) { free(line); fclose(f); return -2; }
    if (line[0] != '>') { free(line); fclose(f); return -2; }
    long n = 0;
    while (fgets(line, BUF, f)) {
        if (line[0] == '>') break;
        long len = (long)strlen(line);
        while (len > 0 && (line[len - 1] == '\n' || line[len - 1] == '\r'))
            --len;
        if (n + len > cap) { free(line); fclose(f); return -3; }
        memcpy(out + n, line, (size_t)len);
        n += len;
    }
    free(line);
    fclose(f);
    return n > 0 ? n : -2;
}

long read_first_fastq(const char* path, unsigned char* out, long cap) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    static const long BUF = 1 << 20;
    char* line = (char*)malloc(BUF);
    long n = -2;
    if (fgets(line, BUF, f) && line[0] == '@' && fgets(line, BUF, f)) {
        long len = (long)strlen(line);
        while (len > 0 && (line[len - 1] == '\n' || line[len - 1] == '\r'))
            --len;
        if (len > cap) n = -3;
        else { memcpy(out, line, (size_t)len); n = len; }
    }
    free(line);
    fclose(f);
    return n;
}

// ---------------------------------------------------------------------
// Linear-gap traceback walk (reference: traceback.impala:47-80).
// P: haloed (m+1)x(n+1) row-major predecessor matrix (codes 0..3).
// Writes the sparse out buffers (out_pos = i+j+1+offsets, '_' gaps).
// start_out[0..1] receives the alignment start cell.
// ---------------------------------------------------------------------
static const unsigned char PRED_NONE = 0, PRED_GAP_Q = 1, PRED_GAP_S = 2,
                           PRED_NO_GAP = 3;
static const unsigned char GAP_SYM = '_';

void traceback_linear(const unsigned char* P, long m, long n, long ei,
                      long ej, const unsigned char* q,
                      const unsigned char* s, unsigned char* out_q,
                      unsigned char* out_s, long off, long* start_out) {
    long i = ei, j = ej;
    long W = n + 1;
    unsigned char pred = P[(i + 1) * W + (j + 1)];
    while (pred != PRED_NONE) {
        unsigned char sym_q = GAP_SYM, sym_s = GAP_SYM;
        long out_pos = i + j + 1 + off;
        if (pred == PRED_NO_GAP || pred == PRED_GAP_S) { sym_q = q[i]; --i; }
        if (pred == PRED_NO_GAP || pred == PRED_GAP_Q) { sym_s = s[j]; --j; }
        out_q[out_pos] = sym_q;
        out_s[out_pos] = sym_s;
        pred = P[(i + 1) * W + (j + 1)];
    }
    start_out[0] = i + 1;
    start_out[1] = j + 1;
}

// ---------------------------------------------------------------------
// Affine (Gotoh) 3-state traceback walk (see ref/oracle_affine.py).
// PH codes 0..3; PE/PF: 0 = opened, 1 = extended.
// ---------------------------------------------------------------------
void traceback_affine(const unsigned char* PH, const unsigned char* PE,
                      const unsigned char* PF, long m, long n, long ei,
                      long ej, const unsigned char* q,
                      const unsigned char* s, unsigned char* out_q,
                      unsigned char* out_s, long off, long* start_out) {
    long i = ei, j = ej;
    long W = n + 1;
    int state = 0;  // 0=H 1=E 2=F
    for (;;) {
        if (state == 0) {
            unsigned char pred = PH[(i + 1) * W + (j + 1)];
            if (pred == PRED_NONE) break;
            if (pred == PRED_NO_GAP) {
                long out_pos = i + j + 1 + off;
                out_q[out_pos] = q[i];
                out_s[out_pos] = s[j];
                --i; --j;
            } else if (pred == PRED_GAP_Q) {
                state = 1;
            } else {
                state = 2;
            }
        } else if (state == 1) {
            long out_pos = i + j + 1 + off;
            out_q[out_pos] = GAP_SYM;
            out_s[out_pos] = s[j];
            int opened = PE[(i + 1) * W + (j + 1)] == 0;
            --j;
            if (opened) state = 0;
        } else {
            long out_pos = i + j + 1 + off;
            out_q[out_pos] = q[i];
            out_s[out_pos] = GAP_SYM;
            int opened = PF[(i + 1) * W + (j + 1)] == 0;
            --i;
            if (opened) state = 0;
        }
        if (i < 0 && j < 0) break;
    }
    start_out[0] = i + 1;
    start_out[1] = j + 1;
}

}  // extern "C"
