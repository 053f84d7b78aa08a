// Native symbolic-analysis kernels for spllt_tpu.
//
// Plays the role SPRAL SSIDS + METIS play for the reference
// (/root/reference/src/spllt_analyse_mod.F90:26-28): the host-side
// combinatorial hot paths — elimination tree, postorder, approximate
// minimum degree ordering, and supernodal row-structure merging — as a
// small C library bound via ctypes (spllt_tpu/analyse/native.py).  Every
// entry point has a NumPy fallback in Python; results must match exactly.
//
// Build: make -C native   (produces libspllt_symbolic.so)

#include <cstdint>
#include <vector>
#include <algorithm>
#include <cstring>

extern "C" {

// --------------------------------------------------------------------- //
// Elimination tree of a symmetric matrix from its lower-triangle CSC
// (Liu's algorithm with path compression).  Mirrors
// spllt_tpu.analyse.etree.etree.
int spllt_etree(int64_t n, const int64_t *colptr, const int64_t *rowind,
                int64_t *parent) {
    std::vector<int64_t> ancestor(n, -1);
    // iterate entries grouped by row r ascending: transpose the lower CSC
    int64_t nnz = colptr[n];
    std::vector<int64_t> rcount(n + 1, 0);
    for (int64_t p = 0; p < nnz; ++p) rcount[rowind[p] + 1]++;
    for (int64_t i = 0; i < n; ++i) rcount[i + 1] += rcount[i];
    std::vector<int64_t> rcols(nnz);
    {
        std::vector<int64_t> pos(rcount.begin(), rcount.end() - 1);
        for (int64_t c = 0; c < n; ++c)
            for (int64_t p = colptr[c]; p < colptr[c + 1]; ++p)
                rcols[pos[rowind[p]]++] = c;
    }
    for (int64_t i = 0; i < n; ++i) parent[i] = -1;
    for (int64_t j = 0; j < n; ++j) {
        for (int64_t p = rcount[j]; p < rcount[j + 1]; ++p) {
            int64_t i = rcols[p];
            while (i != -1 && i < j) {
                int64_t inext = ancestor[i];
                ancestor[i] = j;
                if (inext == -1) parent[i] = j;
                i = inext;
            }
        }
    }
    return 0;
}

// --------------------------------------------------------------------- //
// Postorder of a forest, children visited ascending.  Mirrors
// spllt_tpu.analyse.etree.postorder.
int spllt_postorder(int64_t n, const int64_t *parent, int64_t *post) {
    std::vector<int64_t> head(n, -1), next(n, -1), stack;
    std::vector<int64_t> roots;
    for (int64_t v = n - 1; v >= 0; --v) {
        int64_t p = parent[v];
        if (p == -1) roots.push_back(v);
        else { next[v] = head[p]; head[p] = v; }
    }
    // roots were collected descending; pushing in that order leaves the
    // smallest root on top, so roots are expanded in ascending order
    std::vector<int64_t> state(n, -2);
    int64_t k = 0;
    for (size_t r = 0; r < roots.size(); ++r) stack.push_back(roots[r]);
    while (!stack.empty()) {
        int64_t v = stack.back();
        if (state[v] == -2) state[v] = head[v];
        int64_t c = state[v];
        if (c == -1) { post[k++] = v; stack.pop_back(); }
        else { state[v] = next[c]; stack.push_back(c); }
    }
    return (k == n) ? 0 : 1;
}

// --------------------------------------------------------------------- //
// Approximate minimum degree (quotient-graph, external-degree approx).
// Mirrors spllt_tpu.analyse.ordering._amd_python semantics but with the
// standard AMD machinery; intended for large problems where the Python
// fallback is too slow.
int spllt_amd(int64_t n, const int64_t *colptr, const int64_t *rowind,
              int64_t *perm) {
    // Build full symmetric adjacency (CSR) without diagonal.
    std::vector<int64_t> deg(n, 0);
    for (int64_t c = 0; c < n; ++c)
        for (int64_t p = colptr[c]; p < colptr[c + 1]; ++p) {
            int64_t r = rowind[p];
            if (r != c) { deg[c]++; deg[r]++; }
        }
    std::vector<int64_t> adjptr(n + 1, 0);
    for (int64_t i = 0; i < n; ++i) adjptr[i + 1] = adjptr[i] + deg[i];
    std::vector<int64_t> adj(adjptr[n]);
    {
        std::vector<int64_t> pos(adjptr.begin(), adjptr.end() - 1);
        for (int64_t c = 0; c < n; ++c)
            for (int64_t p = colptr[c]; p < colptr[c + 1]; ++p) {
                int64_t r = rowind[p];
                if (r != c) { adj[pos[c]++] = r; adj[pos[r]++] = c; }
            }
    }
    // Quotient graph: per live variable, a list of variable neighbours and
    // element neighbours; eliminated variables become elements.
    std::vector<std::vector<int64_t>> vnbr(n), enbr(n), elem(n);
    for (int64_t v = 0; v < n; ++v)
        vnbr[v].assign(adj.begin() + adjptr[v], adj.begin() + adjptr[v + 1]);
    std::vector<char> alive(n, 1);
    std::vector<int64_t> degree(n);
    for (int64_t v = 0; v < n; ++v) degree[v] = (int64_t)vnbr[v].size();

    // simple binary heap of (degree, node)
    typedef std::pair<int64_t, int64_t> P;
    std::vector<P> heap;
    heap.reserve(2 * n);
    for (int64_t v = 0; v < n; ++v) heap.push_back(P(degree[v], v));
    std::make_heap(heap.begin(), heap.end(), std::greater<P>());

    std::vector<int64_t> mark(n, -1);   // Lv membership stamp (== v)
    std::vector<int64_t> mark2(n, -1);  // degree-union stamp
    int64_t stamp2 = 0;
    std::vector<int64_t> lv;
    for (int64_t k = 0; k < n; ++k) {
        int64_t v = -1;
        while (!heap.empty()) {
            P top = heap.front();
            std::pop_heap(heap.begin(), heap.end(), std::greater<P>());
            heap.pop_back();
            if (alive[top.second] && top.first == degree[top.second]) {
                v = top.second;
                break;
            }
        }
        if (v < 0) return 1;
        // form element Lv = (vnbr[v] ∪ ⋃ elem[e] for e in enbr[v]) \ {v}
        lv.clear();
        for (size_t i = 0; i < vnbr[v].size(); ++i) {
            int64_t u = vnbr[v][i];
            if (alive[u] && mark[u] != v) { mark[u] = v; lv.push_back(u); }
        }
        for (size_t i = 0; i < enbr[v].size(); ++i) {
            int64_t e = enbr[v][i];
            for (size_t j = 0; j < elem[e].size(); ++j) {
                int64_t u = elem[e][j];
                if (u != v && alive[u] && mark[u] != v) {
                    mark[u] = v;
                    lv.push_back(u);
                }
            }
            elem[e].clear();           // absorbed
        }
        elem[v] = lv;
        alive[v] = 0;
        perm[k] = v;
        // update neighbours
        for (size_t i = 0; i < lv.size(); ++i) {
            int64_t u = lv[i];
            // drop v and Lv members from u's variable list
            std::vector<int64_t> keep;
            keep.reserve(vnbr[u].size());
            for (size_t j = 0; j < vnbr[u].size(); ++j) {
                int64_t w = vnbr[u][j];
                if (w == v || !alive[w]) continue;
                if (mark[w] == v) continue;   // covered by new element
                keep.push_back(w);
            }
            vnbr[u].swap(keep);
            // refresh element list: keep only live elements, add v
            std::vector<int64_t> ekeep;
            ekeep.reserve(enbr[u].size() + 1);
            for (size_t j = 0; j < enbr[u].size(); ++j) {
                int64_t e = enbr[u][j];
                if (!elem[e].empty()) ekeep.push_back(e);
            }
            ekeep.push_back(v);
            enbr[u].swap(ekeep);
            // approximate external degree: |vnbr| + |union of elements|
            int64_t du = (int64_t)vnbr[u].size();
            ++stamp2;
            for (size_t j = 0; j < vnbr[u].size(); ++j)
                mark2[vnbr[u][j]] = stamp2;
            for (size_t j = 0; j < enbr[u].size(); ++j) {
                int64_t e = enbr[u][j];
                for (size_t q = 0; q < elem[e].size(); ++q) {
                    int64_t w = elem[e][q];
                    if (w == u || !alive[w]) continue;
                    if (mark2[w] == stamp2) continue;
                    mark2[w] = stamp2;
                    du++;
                }
            }
            degree[u] = du;
            heap.push_back(P(du, u));
            std::push_heap(heap.begin(), heap.end(), std::greater<P>());
        }
    }
    return 0;
}

}  // extern "C"
