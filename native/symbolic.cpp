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
#include <cstdlib>
#include <string>
#include <unordered_map>

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


// --------------------------------------------------------------------- //
// Supernode detection + nemin amalgamation + L row lists.  Exact port of
// spllt_tpu.analyse.supernodes.find_supernodes (which replaces the SPRAL
// SSIDS sptr/sparent/rptr/rlist outputs the reference consumes,
// /root/reference/src/spllt_analyse_mod.F90:129-131); results must match
// the NumPy fallback bit-for-bit.
//
// Two-call protocol: with null output pointers only sizes[2] =
// {nnodes, len(rows)} is written; a second call fills sa/en/sparent/
// rptr/rows (caller-allocated).
int spllt_supernodes(int64_t n, const int64_t *colptr,
                     const int64_t *rowind, const int64_t *parent,
                     int64_t nemin, int64_t *sizes,
                     int64_t *sa_out, int64_t *en_out, int64_t *par_out,
                     int64_t *rptr_out, int64_t *rows_out) {
    // ---- phase 1: zero-fill supernodes + row lists -------------------- //
    std::vector<int64_t> f_sa, f_en;
    std::vector<std::vector<int64_t>> f_rows;
    // pending children snodes per column: head/next linked lists
    std::vector<int64_t> pend_head(n, -1), pend_next;
    std::vector<int64_t> scratch;
    for (int64_t j = 0; j < n; ++j) {
        const int64_t a0 = colptr[j], a1 = colptr[j + 1];
        bool prev_child = !f_en.empty() && f_en.back() == j - 1 &&
                          parent[j - 1] == j;
        scratch.assign(rowind + a0, rowind + a1);
        const std::vector<int64_t> *below_prev = nullptr;
        int64_t below_prev_off = 0;
        if (prev_child) {
            const size_t s_prev = f_en.size() - 1;
            below_prev = &f_rows[s_prev];
            below_prev_off = f_en[s_prev] - f_sa[s_prev] + 1;
            scratch.insert(scratch.end(),
                           below_prev->begin() + below_prev_off,
                           below_prev->end());
        }
        bool had_pending = false;
        for (int64_t s = pend_head[j]; s != -1; s = pend_next[s]) {
            had_pending = true;
            int64_t nc = f_en[s] - f_sa[s] + 1;
            scratch.insert(scratch.end(), f_rows[s].begin() + nc,
                           f_rows[s].end());
        }
        if (prev_child || had_pending) {
            std::sort(scratch.begin(), scratch.end());
            scratch.erase(std::unique(scratch.begin(), scratch.end()),
                          scratch.end());
        }
        bool merged = false;
        if (prev_child &&
            (int64_t)below_prev->size() - below_prev_off ==
                (int64_t)scratch.size() &&
            std::equal(scratch.begin(), scratch.end(),
                       below_prev->begin() + below_prev_off)) {
            // exact zero-fill merge -> extend the open supernode
            size_t s = f_en.size() - 1;
            int64_t nc_old = f_en[s] - f_sa[s] + 1;
            std::vector<int64_t> nr(f_rows[s].begin(),
                                    f_rows[s].begin() + nc_old);
            nr.insert(nr.end(), scratch.begin(), scratch.end());
            f_rows[s].swap(nr);
            f_en[s] = j;
            merged = true;
        }
        if (!merged) {
            f_sa.push_back(j);
            f_en.push_back(j);
            f_rows.emplace_back(scratch);
        }
        pend_next.resize(f_en.size(), -1);
        int64_t s = (int64_t)f_en.size() - 1;
        int64_t p = parent[j];
        if (p != -1 && p != j + 1) {
            pend_next[s] = pend_head[p];
            pend_head[p] = s;
        }
    }
    const int64_t nf = (int64_t)f_sa.size();

    std::vector<int64_t> col_node(n);
    for (int64_t s = 0; s < nf; ++s)
        for (int64_t c = f_sa[s]; c <= f_en[s]; ++c) col_node[c] = s;
    std::vector<int64_t> f_parent(nf, -1);
    for (int64_t s = 0; s < nf; ++s) {
        int64_t p = parent[f_en[s]];
        f_parent[s] = (p != -1) ? col_node[p] : -1;
    }

    // ---- phase 2: nemin amalgamation (union-find, ascending children) - //
    std::vector<char> alive(nf, 1);
    std::vector<int64_t> sa_m(f_sa), en_m(f_en), rep(nf);
    for (int64_t i = 0; i < nf; ++i) rep[i] = i;
    auto find_rep = [&](int64_t s) {
        while (rep[s] != s) { rep[s] = rep[rep[s]]; s = rep[s]; }
        return s;
    };
    if (nemin > 1) {
        for (int64_t c = 0; c < nf; ++c) {
            int64_t p = f_parent[c];
            if (p == -1) continue;
            p = find_rep(p);
            int64_t c_r = find_rep(c);
            if (c_r == p) continue;
            int64_t nc_c = en_m[c_r] - sa_m[c_r] + 1;
            int64_t nc_p = en_m[p] - sa_m[p] + 1;
            if (en_m[c_r] + 1 != sa_m[p]) continue;
            if (nc_c >= nemin || nc_p >= nemin) continue;
            std::vector<int64_t> nr(f_rows[c_r].begin(),
                                    f_rows[c_r].begin() + nc_c);
            nr.insert(nr.end(), f_rows[p].begin(), f_rows[p].end());
            f_rows[p].swap(nr);
            sa_m[p] = sa_m[c_r];
            alive[c_r] = 0;
            rep[c_r] = p;
        }
    }

    // ---- renumber (stable by sa) -------------------------------------- //
    std::vector<int64_t> keep;
    for (int64_t s = 0; s < nf; ++s) if (alive[s]) keep.push_back(s);
    std::stable_sort(keep.begin(), keep.end(),
                     [&](int64_t a, int64_t b) { return sa_m[a] < sa_m[b]; });
    const int64_t nnodes = (int64_t)keep.size();
    int64_t nrows_total = 0;
    for (int64_t k = 0; k < nnodes; ++k)
        nrows_total += (int64_t)f_rows[keep[k]].size();
    sizes[0] = nnodes;
    sizes[1] = nrows_total;
    if (!sa_out) return 0;   // size-query call

    std::vector<int64_t> col_node2(n);
    for (int64_t k = 0; k < nnodes; ++k)
        for (int64_t c = sa_m[keep[k]]; c <= en_m[keep[k]]; ++c)
            col_node2[c] = k;
    int64_t off = 0;
    rptr_out[0] = 0;
    for (int64_t k = 0; k < nnodes; ++k) {
        int64_t s = keep[k];
        sa_out[k] = sa_m[s];
        en_out[k] = en_m[s];
        int64_t p = parent[en_m[s]];
        par_out[k] = (p != -1) ? col_node2[p] : -1;
        std::memcpy(rows_out + off, f_rows[s].data(),
                    f_rows[s].size() * sizeof(int64_t));
        off += (int64_t)f_rows[s].size();
        rptr_out[k + 1] = off;
    }
    return 0;
}

// ---------------------------------------------------------------------
// Random-order heavy-edge matching (one coarsening level of the
// multilevel nested-dissection ordering, spllt_tpu.analyse.nd).  The
// per-vertex Python loop is the ND ordering's hot spot at scale
// (ADVICE r4 #3); identical traversal order => identical matching.
extern "C" int spllt_hem(int64_t n, const int64_t *indptr,
                         const int64_t *indices, const double *data,
                         const int64_t *order, int64_t *cmap,
                         int64_t *nc_out) {
    std::vector<int64_t> match(n, -1);
    for (int64_t i = 0; i < n; ++i) {
        const int64_t v = order[i];
        if (match[v] >= 0) continue;
        int64_t best = -1;
        double bw = -1.0;
        for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
            const int64_t u = indices[k];
            if (match[u] < 0 && u != v && data[k] > bw) {
                best = u;
                bw = data[k];
            }
        }
        if (best >= 0) {
            match[v] = best;
            match[best] = v;
        } else {
            match[v] = v;
        }
    }
    int64_t nc = 0;
    for (int64_t v = 0; v < n; ++v) cmap[v] = -1;
    for (int64_t v = 0; v < n; ++v) {
        if (cmap[v] < 0) {
            cmap[v] = nc;
            cmap[match[v]] = nc;
            ++nc;
        }
    }
    *nc_out = nc;
    return 0;
}

// ---------------------------------------------------------------------
// Factor-plan task enumeration fast path.  Mirrors the Python loops of
// spllt_tpu.plan.factor_tasks.build_factor_plan (non-coarse path) —
// intra-node right-looking task emission with phase-aware ASAP levels
// plus the ancestor walk emitting width-fused update_between tasks with
// deduplicated position maps.  The reference delegates its analyse to
// native SPRAL/METIS (/root/reference/src/spllt_analyse_mod.F90:26-28);
// this is our equivalent native hot path, exact-match with the NumPy
// fallback (tests/test_symbolic.py::test_factor_plan_native_parity).
//
// Outputs are C++-owned buffers returned through spllt_plan_out; the
// caller copies them into NumPy arrays and calls spllt_plan_free.
// Task arrays are UNSORTED (emission order); Python does the level
// bucketing (vectorized argsort) either way.

struct spllt_plan_out {
    int64_t *potrf;   int64_t n_potrf;   // [n,3] lvl, blk, k
    int64_t *trsm;    int64_t n_trsm;    // [n,4] lvl, diag, dst, k
    int64_t *syrk;    int64_t n_syrk;    // [n,4] lvl, si, sj, dst
    int64_t *updbt;   int64_t n_updbt;   // [n,6] lvl,dst,mr,mc,svp,c
    int64_t *srcvec;  int64_t *srcvec_node; int64_t n_srcvec;
    int32_t *maps;    int64_t n_maps;    // [n_maps, nb]
};

extern "C" void spllt_plan_free(spllt_plan_out *o) {
    if (!o) return;
    free(o->potrf); free(o->trsm); free(o->syrk); free(o->updbt);
    free(o->srcvec); free(o->srcvec_node); free(o->maps);
    delete o;
}

extern "C" int spllt_factor_plan(
    int64_t nnodes, int64_t nb, int64_t nblocks,
    const int64_t *sparent,
    const int64_t *node_ntiles, const int64_t *node_nctiles,
    const int64_t *node_blk_ptr,
    const int64_t *node_sa, const int64_t *node_en,
    const int64_t *node_rptr, const int64_t *rows_all,
    const int64_t *blk_n,
    spllt_plan_out **out_p) {
    std::vector<int64_t> fact_level(nblocks, 0), upd_level(nblocks, 0);
    std::vector<int64_t> potrf, trsm, syrk, updbt;
    std::vector<int64_t> srcvec, srcvec_node;
    std::vector<int32_t> maps;
    std::unordered_map<std::string, int64_t> registry;
    // scratch reused across ancestors
    std::vector<int64_t> pos_a, fmax_t, map_id, touched;
    std::vector<int32_t> vec(nb);

    for (int64_t nd = 0; nd < nnodes; ++nd) {
        const int64_t T = node_ntiles[nd], C = node_nctiles[nd];
        const int64_t b0 = node_blk_ptr[nd];
        auto bid = [&](int64_t ib, int64_t jb) {
            return b0 + jb * T - (jb * (jb - 1)) / 2 + (ib - jb);
        };
        // ---- intra-node right-looking factorization ----
        for (int64_t kb = 0; kb < C; ++kb) {
            const int64_t d = bid(kb, kb);
            const int64_t kcols = blk_n[d];
            int64_t lvl = upd_level[d] > 1 ? upd_level[d] : 1;
            fact_level[d] = lvl;
            potrf.insert(potrf.end(), {lvl, d, kcols});
            for (int64_t ib = kb + 1; ib < T; ++ib) {
                const int64_t t = bid(ib, kb);
                int64_t l2 = fact_level[d];
                if (upd_level[t] > l2) l2 = upd_level[t];
                if (l2 < 1) l2 = 1;
                fact_level[t] = l2;
                trsm.insert(trsm.end(), {l2, d, t, kcols});
            }
            for (int64_t jb2 = kb + 1; jb2 < C; ++jb2) {
                const int64_t sj = bid(jb2, kb);
                const int64_t fsj = fact_level[sj];
                for (int64_t ib2 = jb2; ib2 < T; ++ib2) {
                    const int64_t si = bid(ib2, kb);
                    const int64_t dst = bid(ib2, jb2);
                    int64_t l3 = fact_level[si] > fsj ? fact_level[si]
                                                      : fsj;
                    l3 += 1;
                    syrk.insert(syrk.end(), {l3, si, sj, dst});
                    if (l3 > upd_level[dst]) upd_level[dst] = l3;
                }
            }
        }
        // ---- inter-node updates into ancestors ----
        const int64_t svp0 = (int64_t)srcvec.size();
        for (int64_t kb = 0; kb < C; ++kb) {
            srcvec.push_back(b0 + kb * T - (kb * (kb - 1)) / 2 - kb);
            srcvec_node.push_back(nd);
        }
        const int64_t *nrows = rows_all + node_rptr[nd];
        const int64_t nr = node_rptr[nd + 1] - node_rptr[nd];
        int64_t anc = sparent[nd];
        while (anc != -1) {
            // lo = first row >= node_sa[anc]
            const int64_t *lo_p = std::lower_bound(nrows, nrows + nr,
                                                   node_sa[anc]);
            const int64_t lo = lo_p - nrows;
            if (lo >= nr) break;
            const int64_t *hi_p = std::lower_bound(nrows, nrows + nr,
                                                   node_en[anc] + 1);
            const int64_t hi = hi_p - nrows;
            if (hi > lo) {
                const int64_t ns = nr - lo;   // rows from lo to end
                const int64_t *a_rows = rows_all + node_rptr[anc];
                const int64_t na = node_rptr[anc + 1]
                    - node_rptr[anc];
                pos_a.resize(ns);
                {   // merge scan: both sorted, a_rows superset
                    int64_t j = 0;
                    for (int64_t i = 0; i < ns; ++i) {
                        const int64_t s = nrows[lo + i];
                        while (j < na && a_rows[j] < s) ++j;
                        if (j >= na || a_rows[j] != s) return -2;
                        pos_a[i] = j;
                    }
                }
                // touched tiles (run boundaries of pos_a / nb),
                // per-tile deepest source level, per-tile map id
                touched.clear(); fmax_t.clear(); map_id.clear();
                int64_t ncols_part_tiles = 0;
                const int64_t ncols_part = hi - lo;
                int64_t i0 = 0;
                while (i0 < ns) {
                    const int64_t tb = pos_a[i0] / nb;
                    int64_t i1 = i0;
                    int64_t fmax = 0;
                    std::fill(vec.begin(), vec.end(), (int32_t)-1);
                    while (i1 < ns && pos_a[i1] / nb == tb) {
                        const int64_t p_src = lo + i1;
                        const int64_t st = p_src / nb;
                        const int64_t cj = st < C - 1 ? st : C - 1;
                        const int64_t fl = fact_level[bid(st, cj)];
                        if (fl > fmax) fmax = fl;
                        vec[pos_a[i1] % nb] = (int32_t)p_src;
                        ++i1;
                    }
                    if (i0 < ncols_part) ++ncols_part_tiles;
                    std::string key((const char *)vec.data(),
                                    nb * sizeof(int32_t));
                    auto it = registry.find(key);
                    int64_t mid;
                    if (it == registry.end()) {
                        mid = (int64_t)(maps.size() / nb);
                        registry.emplace(std::move(key), mid);
                        maps.insert(maps.end(), vec.begin(), vec.end());
                    } else {
                        mid = it->second;
                    }
                    touched.push_back(tb);
                    fmax_t.push_back(fmax);
                    map_id.push_back(mid);
                    i0 = i1;
                }
                const int64_t ntt = (int64_t)touched.size();
                const int64_t aT = node_ntiles[anc];
                const int64_t a0 = node_blk_ptr[anc];
                for (int64_t jj = 0; jj < ncols_part_tiles; ++jj) {
                    const int64_t jbt = touched[jj];
                    for (int64_t ii = jj; ii < ntt; ++ii) {
                        const int64_t ibt = touched[ii];
                        int64_t lvl = fmax_t[ii] > fmax_t[jj]
                            ? fmax_t[ii] : fmax_t[jj];
                        lvl += 1;
                        const int64_t dst = a0 + jbt * aT
                            - (jbt * (jbt - 1)) / 2 + (ibt - jbt);
                        updbt.insert(updbt.end(),
                                     {lvl, dst, map_id[ii], map_id[jj],
                                      svp0, C});
                        if (lvl > upd_level[dst]) upd_level[dst] = lvl;
                    }
                }
            }
            anc = sparent[anc];
        }
    }

    auto copy64 = [](const std::vector<int64_t> &v) {
        int64_t *p = (int64_t *)malloc(
            (v.size() ? v.size() : 1) * sizeof(int64_t));
        std::memcpy(p, v.data(), v.size() * sizeof(int64_t));
        return p;
    };
    spllt_plan_out *o = new spllt_plan_out();
    o->potrf = copy64(potrf);   o->n_potrf = (int64_t)potrf.size() / 3;
    o->trsm = copy64(trsm);     o->n_trsm = (int64_t)trsm.size() / 4;
    o->syrk = copy64(syrk);     o->n_syrk = (int64_t)syrk.size() / 4;
    o->updbt = copy64(updbt);   o->n_updbt = (int64_t)updbt.size() / 6;
    o->srcvec = copy64(srcvec);
    o->srcvec_node = copy64(srcvec_node);
    o->n_srcvec = (int64_t)srcvec.size();
    o->maps = (int32_t *)malloc(
        (maps.size() ? maps.size() : 1) * sizeof(int32_t));
    std::memcpy(o->maps, maps.data(), maps.size() * sizeof(int32_t));
    o->n_maps = (int64_t)maps.size() / nb;
    *out_p = o;
    return 0;
}

}  // extern "C"
