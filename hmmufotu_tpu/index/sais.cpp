// Suffix-array construction via SA-IS (induced sorting).
//
// Native replacement for the role of the vendored libdivsufsort in the
// reference (reference: src/libdivsufsort/, used once per database
// build, CSFMIndex.cpp:327-335).  This is a from-scratch
// implementation of the SA-IS algorithm (Nong, Zhang & Chan 2009):
// classify suffixes L/S, induce-sort LMS substrings, name them,
// recurse on the reduced string when names repeat, then induce the
// final order.  O(n) time, O(n) extra space.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using std::vector;

inline void get_counts(const int32_t *T, int32_t *C, int64_t n,
                       int32_t K) {
    std::memset(C, 0, sizeof(int32_t) * (K + 1));
    for (int64_t i = 0; i < n; ++i) ++C[T[i]];
}

// B[c] = bucket start (end=false) or one-past-end (end=true) for c
inline void get_buckets(const int32_t *C, int32_t *B, int32_t K,
                        bool end) {
    int32_t sum = 0;
    for (int32_t c = 0; c <= K; ++c) {
        sum += C[c];
        B[c] = end ? sum : sum - C[c];
    }
}

void induce(const int32_t *T, int32_t *SA, const vector<bool> &is_s,
            vector<int32_t> &C, vector<int32_t> &B, int64_t n,
            int32_t K) {
    // induce L-type left-to-right from bucket heads
    get_counts(T, C.data(), n, K);
    get_buckets(C.data(), B.data(), K, false);
    for (int64_t i = 0; i < n; ++i) {
        int64_t j = SA[i];
        if (j > 0 && !is_s[j - 1]) SA[B[T[j - 1]]++] = (int32_t)(j - 1);
    }
    // induce S-type right-to-left from bucket tails
    get_counts(T, C.data(), n, K);
    get_buckets(C.data(), B.data(), K, true);
    for (int64_t i = n - 1; i >= 0; --i) {
        int64_t j = SA[i];
        if (j > 0 && is_s[j - 1]) SA[--B[T[j - 1]]] = (int32_t)(j - 1);
    }
}

// SA-IS over T[0..n-1]; T[n-1] must be the unique smallest symbol (0).
void sais_rec(const int32_t *T, int32_t *SA, int64_t n, int32_t K) {
    if (n == 1) { SA[0] = 0; return; }

    vector<bool> is_s(n);
    is_s[n - 1] = true;
    for (int64_t i = n - 2; i >= 0; --i)
        is_s[i] = T[i] < T[i + 1] || (T[i] == T[i + 1] && is_s[i + 1]);

    auto is_lms = [&](int64_t i) {
        return i > 0 && is_s[i] && !is_s[i - 1];
    };

    vector<int32_t> C(K + 1), B(K + 1);

    // step 1: place LMS suffixes at their bucket tails, induce
    std::memset(SA, -1, sizeof(int32_t) * n);
    get_counts(T, C.data(), n, K);
    get_buckets(C.data(), B.data(), K, true);
    for (int64_t i = n - 1; i >= 0; --i)
        if (is_lms(i)) SA[--B[T[i]]] = (int32_t)i;
    induce(T, SA, is_s, C, B, n, K);

    // step 2: compact the (now sorted) LMS substrings and name them
    int64_t n1 = 0;
    for (int64_t i = 0; i < n; ++i)
        if (is_lms(SA[i])) SA[n1++] = SA[i];
    std::memset(SA + n1, -1, sizeof(int32_t) * (n - n1));

    int32_t name = 0;
    int64_t prev = -1;
    for (int64_t i = 0; i < n1; ++i) {
        int64_t pos = SA[i];
        bool diff = false;
        if (prev < 0) {
            diff = true;
        } else {
            // compare LMS substrings at prev and pos
            for (int64_t d = 0;; ++d) {
                if (T[pos + d] != T[prev + d] ||
                    is_s[pos + d] != is_s[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    diff = is_lms(pos + d) != is_lms(prev + d);
                    break;
                }
            }
        }
        if (diff) { ++name; prev = pos; }
        SA[n1 + pos / 2] = name - 1;
    }
    // gather names in text order into the reduced string
    for (int64_t i = n - 1, j = n - 1; i >= n1; --i)
        if (SA[i] >= 0) SA[j--] = SA[i];

    int32_t *T1 = SA + n - n1;
    int32_t *SA1 = SA;
    if (name < n1) {
        sais_rec(T1, SA1, n1, name - 1);
    } else {
        for (int64_t i = 0; i < n1; ++i) SA1[T1[i]] = (int32_t)i;
    }

    // step 3: map reduced order back to LMS positions, induce final
    vector<int32_t> lms;
    lms.reserve(n1);
    for (int64_t i = 0; i < n; ++i)
        if (is_lms(i)) lms.push_back((int32_t)i);
    for (int64_t i = 0; i < n1; ++i) SA1[i] = lms[SA1[i]];

    std::memset(SA + n1, -1, sizeof(int32_t) * (n - n1));
    get_counts(T, C.data(), n, K);
    get_buckets(C.data(), B.data(), K, true);
    for (int64_t i = n1 - 1; i >= 0; --i) {
        int64_t j = SA[i];
        SA[i] = -1;
        SA[--B[T[j]]] = (int32_t)j;
    }
    induce(T, SA, is_s, C, B, n, K);
}

}  // namespace

extern "C" {

// T: n symbols in 1..K (caller appends nothing); computes the suffix
// array of T into SA (length n).  Internally appends a 0 sentinel.
// Returns 0 on success.
int32_t hmmufotu_sais(const int32_t *T, int32_t *SA, int64_t n,
                      int32_t K) {
    if (n <= 0) return -1;
    vector<int32_t> Ts(n + 1);
    std::memcpy(Ts.data(), T, sizeof(int32_t) * n);
    Ts[n] = 0;
    vector<int32_t> SAs(n + 1);
    sais_rec(Ts.data(), SAs.data(), n + 1, K);
    // drop the sentinel row (always first)
    std::memcpy(SA, SAs.data() + 1, sizeof(int32_t) * n);
    return 0;
}
}
