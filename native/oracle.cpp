// Host-side scalar oracle for rapidfuzz_tpu.
//
// Independent, textbook implementations of every metric's *semantics* as
// documented in SURVEY.md (reference: /root/reference/src/distance/*.rs).
// These are intentionally simple O(N*M) / linear algorithms — a third
// opinion against both the reference (bit-parallel Rust) and the TPU
// kernels (batched bit-parallel JAX/Pallas), used for conformance testing
// and as the host fast path for tiny one-shot calls where device dispatch
// latency would dominate.
//
// Elements are int64 "hash keys" (equality-preserving encoding done by the
// Python codec). All functions return raw scores; cutoff algebra lives in
// Python (mirrors src/details/distance.rs which derives all score kinds
// from the raw metric).
//
// Build: g++ -O2 -shared -fPIC -o librf_oracle.so oracle.cpp

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

using std::int64_t;
using std::min;
using std::max;
using std::size_t;
using std::vector;

extern "C" {

// ---------------------------------------------------------------- helpers
static size_t common_prefix(const int64_t* a, size_t n1, const int64_t* b, size_t n2) {
    size_t n = min(n1, n2), i = 0;
    while (i < n && a[i] == b[i]) i++;
    return i;
}

static size_t common_suffix(const int64_t* a, size_t n1, const int64_t* b, size_t n2) {
    size_t n = min(n1, n2), i = 0;
    while (i < n && a[n1 - 1 - i] == b[n2 - 1 - i]) i++;
    return i;
}

// Strip common affix (suffix first, then prefix — semantics of
// src/details/common.rs:79-108; order only matters for which indices
// remain, not for any metric value).
static void strip_affix(const int64_t*& a, size_t& n1, const int64_t*& b, size_t& n2) {
    size_t suf = common_suffix(a, n1, b, n2);
    n1 -= suf; n2 -= suf;
    size_t pre = common_prefix(a, n1, b, n2);
    a += pre; b += pre; n1 -= pre; n2 -= pre;
}

// ------------------------------------------------------------ Levenshtein
int64_t rf_levenshtein_uniform(const int64_t* a, int64_t n1_,
                               const int64_t* b, int64_t n2_) {
    size_t n1 = (size_t)n1_, n2 = (size_t)n2_;
    strip_affix(a, n1, b, n2);
    if (n1 == 0) return (int64_t)n2;
    if (n2 == 0) return (int64_t)n1;
    vector<int64_t> row(n1 + 1);
    for (size_t i = 0; i <= n1; i++) row[i] = (int64_t)i;
    for (size_t j = 1; j <= n2; j++) {
        int64_t diag = row[0];
        row[0] = (int64_t)j;
        for (size_t i = 1; i <= n1; i++) {
            int64_t tmp = row[i];
            int64_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
            row[i] = min(min(row[i] + 1, row[i - 1] + 1), diag + cost);
            diag = tmp;
        }
    }
    return row[n1];
}

// Banded Levenshtein DP: exact distance if it is <= band, else > band.
// Ukkonen band |i-j| <= band around the diagonal.
static int64_t lev_banded(const int64_t* a, size_t n1, const int64_t* b,
                          size_t n2, int64_t band) {
    if (n1 > n2) { std::swap(a, b); std::swap(n1, n2); }
    if ((int64_t)(n2 - n1) > band) return band + 1;
    int64_t INF = band + 1;
    // row over j in [i-band, i+band]
    size_t width = (size_t)(2 * band + 1);
    vector<int64_t> prev(width + 2, INF), cur(width + 2, INF);
    // prev[k] = D[i][j] where j = i - band + (k-1)
    for (size_t k = 1; k <= width; k++) {
        int64_t j = (int64_t)0 - band + (int64_t)(k - 1);
        if (j >= 0 && j <= (int64_t)n2) prev[k] = j;
    }
    for (size_t i = 1; i <= n1; i++) {
        for (size_t k = 0; k < width + 2; k++) cur[k] = INF;
        int64_t jlo = (int64_t)i - band, jhi = (int64_t)i + band;
        for (int64_t j = std::max<int64_t>(jlo, 0);
             j <= std::min<int64_t>(jhi, (int64_t)n2); j++) {
            size_t k = (size_t)(j - jlo + 1);
            if (j == 0) { cur[k] = (int64_t)i; continue; }
            int64_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
            // D[i-1][j-1] -> prev[k]; D[i-1][j] -> prev[k+1]; D[i][j-1] -> cur[k-1]
            int64_t v = prev[k] + cost;
            if (prev[k + 1] < INF) v = min(v, prev[k + 1] + 1);
            if (cur[k - 1] < INF) v = min(v, cur[k - 1] + 1);
            cur[k] = min(v, INF);
        }
        std::swap(prev, cur);
    }
    int64_t j = (int64_t)n2, jlo = (int64_t)n1 - band;
    if (j < jlo || j > (int64_t)n1 + band) return INF;
    return prev[(size_t)(j - jlo + 1)];
}

// Exact uniform Levenshtein with band doubling (fast for long strings).
int64_t rf_levenshtein_uniform_banded(const int64_t* a, int64_t n1_,
                                      const int64_t* b, int64_t n2_) {
    size_t n1 = (size_t)n1_, n2 = (size_t)n2_;
    strip_affix(a, n1, b, n2);
    if (n1 == 0) return (int64_t)n2;
    if (n2 == 0) return (int64_t)n1;
    int64_t band = max<int64_t>(64, (int64_t)(n1 > n2 ? n1 - n2 : n2 - n1));
    int64_t lim = (int64_t)max(n1, n2);
    while (true) {
        int64_t d = lev_banded(a, n1, b, n2, band);
        if (d <= band || band >= lim) return d;
        band *= 2;
        if (band > lim) band = lim;
    }
}

// Weighted Levenshtein: delete a-element = del, insert b-element = ins,
// substitute = sub (generalized_wagner_fischer, levenshtein.rs:212-259).
int64_t rf_levenshtein_weighted(const int64_t* a, int64_t n1_,
                                const int64_t* b, int64_t n2_,
                                int64_t ins, int64_t del, int64_t sub) {
    size_t n1 = (size_t)n1_, n2 = (size_t)n2_;
    strip_affix(a, n1, b, n2);
    vector<int64_t> row(n1 + 1);
    for (size_t i = 0; i <= n1; i++) row[i] = (int64_t)i * del;
    for (size_t j = 1; j <= n2; j++) {
        int64_t diag = row[0];
        row[0] += ins;
        for (size_t i = 1; i <= n1; i++) {
            int64_t tmp = row[i];
            int64_t v;
            if (a[i - 1] == b[j - 1]) v = diag;
            else v = min(min(row[i - 1] + del, row[i] + ins), diag + sub);
            row[i] = v;
            diag = tmp;
        }
    }
    return row[n1];
}

// -------------------------------------------------------------------- LCS
int64_t rf_lcs_seq(const int64_t* a, int64_t n1_, const int64_t* b, int64_t n2_) {
    size_t n1 = (size_t)n1_, n2 = (size_t)n2_;
    // affix counts toward the LCS
    size_t suf = common_suffix(a, n1, b, n2);
    n1 -= suf; n2 -= suf;
    size_t pre = common_prefix(a, n1, b, n2);
    a += pre; b += pre; n1 -= pre; n2 -= pre;
    int64_t affix = (int64_t)(pre + suf);
    if (n1 == 0 || n2 == 0) return affix;
    vector<int64_t> row(n1 + 1, 0);
    for (size_t j = 1; j <= n2; j++) {
        int64_t diag = 0;
        for (size_t i = 1; i <= n1; i++) {
            int64_t tmp = row[i];
            if (a[i - 1] == b[j - 1]) row[i] = diag + 1;
            else row[i] = max(row[i], row[i - 1]);
            diag = tmp;
        }
    }
    return affix + row[n1];
}

int64_t rf_indel(const int64_t* a, int64_t n1, const int64_t* b, int64_t n2) {
    return n1 + n2 - 2 * rf_lcs_seq(a, n1, b, n2);
}

// -------------------------------------------------------------------- OSA
int64_t rf_osa(const int64_t* a, int64_t n1_, const int64_t* b, int64_t n2_) {
    size_t n1 = (size_t)n1_, n2 = (size_t)n2_;
    strip_affix(a, n1, b, n2);
    if (n1 == 0) return (int64_t)n2;
    if (n2 == 0) return (int64_t)n1;
    vector<int64_t> prev2(n1 + 1), prev(n1 + 1), cur(n1 + 1);
    for (size_t i = 0; i <= n1; i++) prev[i] = (int64_t)i;
    for (size_t j = 1; j <= n2; j++) {
        cur[0] = (int64_t)j;
        for (size_t i = 1; i <= n1; i++) {
            int64_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
            int64_t v = min(min(cur[i - 1] + 1, prev[i] + 1), prev[i - 1] + cost);
            if (i > 1 && j > 1 && a[i - 1] == b[j - 2] && a[i - 2] == b[j - 1])
                v = min(v, prev2[i - 2] + 1);
            cur[i] = v;
        }
        prev2 = prev; prev = cur;
    }
    return prev[n1];
}

// --------------------------------------------- Damerau-Levenshtein (true)
// Lowrance-Wagner unrestricted transpositions, full-matrix formulation —
// semantically equal to the reference's Zhao-Sahni linear-space algorithm
// (damerau_levenshtein.rs:111-168) but independently derived.
int64_t rf_damerau(const int64_t* a, int64_t n1_, const int64_t* b, int64_t n2_) {
    size_t n1 = (size_t)n1_, n2 = (size_t)n2_;
    strip_affix(a, n1, b, n2);
    if (n1 == 0) return (int64_t)n2;
    if (n2 == 0) return (int64_t)n1;
    int64_t INF = (int64_t)(n1 + n2);
    size_t R = n1 + 2, C = n2 + 2;
    vector<int64_t> d(R * C);
    auto D = [&](size_t i, size_t j) -> int64_t& { return d[i * C + j]; };
    D(0, 0) = INF;
    for (size_t i = 0; i <= n1; i++) { D(i + 1, 0) = INF; D(i + 1, 1) = (int64_t)i; }
    for (size_t j = 0; j <= n2; j++) { D(0, j + 1) = INF; D(1, j + 1) = (int64_t)j; }

    // last row index (1-based) where each symbol occurred in `a`
    // symbols are arbitrary int64: use a small map via sorted vector
    vector<int64_t> syms(a, a + n1);
    syms.insert(syms.end(), b, b + n2);
    std::sort(syms.begin(), syms.end());
    syms.erase(std::unique(syms.begin(), syms.end()), syms.end());
    auto sym_id = [&](int64_t c) -> size_t {
        return (size_t)(std::lower_bound(syms.begin(), syms.end(), c) - syms.begin());
    };
    vector<int64_t> da(syms.size(), 0);

    for (size_t i = 1; i <= n1; i++) {
        int64_t db = 0;
        for (size_t j = 1; j <= n2; j++) {
            int64_t k = da[sym_id(b[j - 1])];   // last row < i with a[k]==b[j]
            int64_t l = db;                     // last col < j with b[l]==a[i]
            int64_t cost = 1;
            if (a[i - 1] == b[j - 1]) { cost = 0; db = (int64_t)j; }
            int64_t v = min(min(D(i, j) + cost,            // substitution
                                D(i + 1, j) + 1),          // insertion
                            D(i, j + 1) + 1);              // deletion
            v = min(v, D((size_t)k, (size_t)l) + (int64_t)(i - k - 1) + 1 +
                           (int64_t)(j - l - 1));          // transposition
            D(i + 1, j + 1) = v;
        }
        da[sym_id(a[i - 1])] = (int64_t)i;
    }
    return D(n1 + 1, n2 + 1);
}

// ---------------------------------------------------------------- Hamming
// Padding semantics: overhang counts one mismatch per element
// (hamming.rs:138-161). Length equality enforcement lives in Python.
int64_t rf_hamming(const int64_t* a, int64_t n1, const int64_t* b, int64_t n2) {
    int64_t n = min(n1, n2), d = max(n1, n2) - n;
    for (int64_t i = 0; i < n; i++) d += (a[i] != b[i]);
    return d;
}

// ---------------------------------------------------------- prefix/postfix
int64_t rf_prefix_sim(const int64_t* a, int64_t n1, const int64_t* b, int64_t n2) {
    return (int64_t)common_prefix(a, (size_t)n1, b, (size_t)n2);
}
int64_t rf_postfix_sim(const int64_t* a, int64_t n1, const int64_t* b, int64_t n2) {
    return (int64_t)common_suffix(a, (size_t)n1, b, (size_t)n2);
}

// ------------------------------------------------------------------- Jaro
// Exact replication of the reference's match-assignment semantics
// (jaro.rs:422-514): window bound from the longer string, truncation of the
// longer string to shorter+bound, common prefix excluded from transposition
// counting, then per text char greedily claim the lowest unflagged matching
// pattern position inside the moving window.
double rf_jaro(const int64_t* a, int64_t n1_, const int64_t* b, int64_t n2_) {
    size_t len1 = (size_t)n1_, len2 = (size_t)n2_;
    size_t o1 = len1, o2 = len2;
    if (o1 == 0 && o2 == 0) return 1.0;
    if (o1 == 0 || o2 == 0) return 0.0;
    if (o1 == 1 && o2 == 1) return (a[0] == b[0]) ? 1.0 : 0.0;

    size_t bound;
    if (len2 > len1) {
        bound = len2 / 2 - 1;
        if (len2 > len1 + bound) len2 = len1 + bound;
    } else {
        bound = len1 / 2 - 1;
        if (len1 > len2 + bound) len1 = len2 + bound;
    }

    size_t pre = common_prefix(a, len1, b, len2);
    size_t common = pre;
    const int64_t* pa = a + pre; size_t m = len1 - pre;   // pattern
    const int64_t* pb = b + pre; size_t t = len2 - pre;   // text
    size_t transpositions = 0;

    if (m != 0 && t != 0) {
        vector<char> pflag(m, 0), tflag(t, 0);
        for (size_t j = 0; j < t; j++) {
            size_t lo = (j > bound) ? j - bound : 0;
            size_t hi = min(m, j + bound + 1);
            for (size_t i = lo; i < hi; i++) {
                if (!pflag[i] && pa[i] == pb[j]) {
                    pflag[i] = 1; tflag[j] = 1; common++;
                    break;
                }
            }
        }
        // transpositions: rank-matched flagged chars that differ
        vector<int64_t> fa, fb;
        for (size_t i = 0; i < m; i++) if (pflag[i]) fa.push_back(pa[i]);
        for (size_t j = 0; j < t; j++) if (tflag[j]) fb.push_back(pb[j]);
        for (size_t k = 0; k < fa.size(); k++)
            transpositions += (fa[k] != fb[k]);
    }

    if (common == 0) return 0.0;
    size_t tr = transpositions / 2;
    double sim = (double)common / (double)o1
               + (double)common / (double)o2
               + ((double)common - (double)tr) / (double)common;
    return sim / 3.0;
}

// jaro_winkler.rs:64-101 (boost applied when jaro sim > 0.7)
double rf_jaro_winkler(const int64_t* a, int64_t n1, const int64_t* b, int64_t n2,
                       double prefix_weight) {
    int64_t maxp = min((int64_t)4, min(n1, n2));
    int64_t pre = 0;
    while (pre < maxp && a[pre] == b[pre]) pre++;
    double sim = rf_jaro(a, n1, b, n2);
    if (sim > 0.7) sim += (double)pre * prefix_weight * (1.0 - sim);
    return sim;
}

// --------------------------------------------------- batched convenience
// One-vs-many over a flat corpus (offsets[count+1] prefix array), for the
// host scalar fast path / BatchComparator CPU mode.
void rf_levenshtein_uniform_1vN(const int64_t* q, int64_t nq,
                                const int64_t* flat, const int64_t* offsets,
                                int64_t count, int64_t* out) {
    for (int64_t i = 0; i < count; i++) {
        out[i] = rf_levenshtein_uniform(q, nq, flat + offsets[i],
                                        offsets[i + 1] - offsets[i]);
    }
}

void rf_indel_1vN(const int64_t* q, int64_t nq,
                  const int64_t* flat, const int64_t* offsets,
                  int64_t count, int64_t* out) {
    for (int64_t i = 0; i < count; i++) {
        out[i] = rf_indel(q, nq, flat + offsets[i], offsets[i + 1] - offsets[i]);
    }
}

// fuzz.partial_ratio (rapidfuzz-cpp semantics; absent from the crate,
// fuzz.rs:207-213): best indel ratio of the SHORTER string against every
// clipped window of the longer — windows longer[max(0, i - m) : min(n, i)]
// for i in 1..n+m-1.  Brute force per window via rf_indel; the f64 score
// uses the same 1 - dist/total expression as the library's host path so
// comparisons are bit-exact.
double rf_partial_ratio(const int64_t* a, int64_t n1,
                        const int64_t* b, int64_t n2) {
    const int64_t* s = a; int64_t ns = n1;
    const int64_t* l = b; int64_t nl = n2;
    if (n1 > n2) { s = b; ns = n2; l = a; nl = n1; }
    if (ns == 0) return nl == 0 ? 1.0 : 0.0;
    double best = -1.0;
    for (int64_t i = 1; i < nl + ns; i++) {
        int64_t st = i - ns > 0 ? i - ns : 0;
        int64_t en = i < nl ? i : nl;
        int64_t wlen = en - st;
        int64_t dist = rf_indel(s, ns, l + st, wlen);
        int64_t tot = ns + wlen;
        double r = 1.0 - (double)dist / (double)(tot > 0 ? tot : 1);
        if (r > best) best = r;
    }
    return best;
}

}  // extern "C"
