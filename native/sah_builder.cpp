// Native binned-SAH BVH builder (C++17, std::thread task parallelism).
//
// The host-side production builder: same decisions as the python
// frontier builder (embree_tpu/build/sah.py) and as the reference's
// GeneralBVHBuilder (kernels/builders/bvh_builder_sah.h:202-301 /
// heuristic_binning.h) — 32-bin centroid binning, SAH sweep,
// leaf-vs-split test, median-split fallback — implemented as a
// recursive task tree with a work split threshold (the TaskScheduler
// analog, common/tasking/taskschedulerinternal.h).
//
// Exposed via a C ABI for the ctypes binding in embree_tpu/build/native.py.

#include <algorithm>
#include <atomic>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <future>
#include <thread>
#include <vector>

namespace {

constexpr int NBINS = 32;

struct Vec3 {
    float x, y, z;
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct BBox {
    Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
    Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
    void extend(const BBox& o) {
        lo = vmin(lo, o.lo);
        hi = vmax(hi, o.hi);
    }
    void extend(const Vec3& p) {
        lo = vmin(lo, p);
        hi = vmax(hi, p);
    }
    float half_area() const {
        float dx = std::max(hi.x - lo.x, 0.f);
        float dy = std::max(hi.y - lo.y, 0.f);
        float dz = std::max(hi.z - lo.z, 0.f);
        return dx * dy + dy * dz + dz * dx;
    }
};

struct Node2 {
    // child ref: >= 0 node index, < 0 leaf: -(start * leaf_mult + count + 1)
    int64_t child[2];
    BBox bounds[2];
};

struct Builder {
    const float* lower;  // (P, 3)
    const float* upper;
    std::vector<Vec3> centroid;
    std::vector<int64_t> order;
    std::vector<Node2> nodes;
    std::mutex node_mutex;
    int max_leaf, min_leaf, branching;
    int64_t leaf_mult;
    float travcost = 1.f, intcost = 1.f;

    BBox prim_box(int64_t p) const {
        BBox b;
        b.lo = {lower[3 * p], lower[3 * p + 1], lower[3 * p + 2]};
        b.hi = {upper[3 * p], upper[3 * p + 1], upper[3 * p + 2]};
        return b;
    }

    int64_t alloc_node() {
        std::lock_guard<std::mutex> g(node_mutex);
        nodes.emplace_back();
        return (int64_t)nodes.size() - 1;
    }

    // returns child ref for range [s, e)
    int64_t build_range(int64_t s, int64_t e, int depth) {
        int64_t n = e - s;
        BBox geom, cent;
        for (int64_t i = s; i < e; ++i) {
            geom.extend(prim_box(order[i]));
            cent.extend(centroid[order[i]]);
        }
        return build_rec(s, e, geom, cent, depth);
    }

    int64_t build_rec(int64_t s, int64_t e, const BBox& geom, const BBox& cent,
                      int depth) {
        const int64_t n = e - s;
        if (n <= min_leaf) return -(s * leaf_mult + n + 1);

        // --- binning (heuristic_binning.h BinMapping/BinInfoT) -----------
        float ext[3] = {cent.hi.x - cent.lo.x, cent.hi.y - cent.lo.y,
                        cent.hi.z - cent.lo.z};
        float scale[3];
        for (int a = 0; a < 3; ++a)
            scale[a] = ext[a] > 0 ? NBINS * (1.f - 1e-6f) / ext[a] : 0.f;

        int64_t counts[3][NBINS] = {};
        BBox bins[3][NBINS];
        const float clo[3] = {cent.lo.x, cent.lo.y, cent.lo.z};
        for (int64_t i = s; i < e; ++i) {
            const int64_t p = order[i];
            const Vec3& c = centroid[p];
            const float cc[3] = {c.x, c.y, c.z};
            BBox pb = prim_box(p);
            for (int a = 0; a < 3; ++a) {
                int b = (int)((cc[a] - clo[a]) * scale[a]);
                b = std::min(std::max(b, 0), NBINS - 1);
                counts[a][b]++;
                bins[a][b].extend(pb);
            }
        }

        // --- SAH sweep (heuristic_binning.h best()) -----------------------
        float best_cost = FLT_MAX;
        int best_axis = -1, best_bin = -1;
        for (int a = 0; a < 3; ++a) {
            if (ext[a] <= 0) continue;
            float rarea[NBINS];
            BBox acc;
            int64_t rcount[NBINS];
            int64_t rc = 0;
            for (int b = NBINS - 1; b >= 1; --b) {
                acc.extend(bins[a][b]);
                rc += counts[a][b];
                rarea[b] = acc.half_area();
                rcount[b] = rc;
            }
            BBox lacc;
            int64_t lc = 0;
            for (int b = 0; b < NBINS - 1; ++b) {
                lacc.extend(bins[a][b]);
                lc += counts[a][b];
                if (lc == 0 || rcount[b + 1] == 0) continue;
                float cost = lacc.half_area() * lc + rarea[b + 1] * rcount[b + 1];
                if (cost < best_cost) {
                    best_cost = cost;
                    best_axis = a;
                    best_bin = b;
                }
            }
        }

        // --- leaf / split decision (bvh_builder_sah.h:216-222) ------------
        const float area = geom.half_area();
        const float leaf_sah = intcost * n * area;
        const float split_sah = travcost * area + intcost * best_cost;
        const bool no_split = best_axis < 0;
        if (n <= max_leaf && (no_split || leaf_sah <= split_sah))
            return -(s * leaf_mult + n + 1);

        // --- partition ----------------------------------------------------
        int64_t mid;
        if (no_split || depth > 64) {
            mid = s + n / 2;  // median fallback (createLargeLeaf analog)
            // split the LARGEST-extent centroid axis (bvh_builder_sah.h
            // fallback semantics); always sorting x degrades long-thin
            // subtrees (round-2 advisor finding)
            int ax = 0;
            if (ext[1] > ext[ax]) ax = 1;
            if (ext[2] > ext[ax]) ax = 2;
            std::nth_element(order.begin() + s, order.begin() + mid,
                             order.begin() + e,
                             [&](int64_t a, int64_t b) {
                                 const float* ca = &centroid[a].x;
                                 const float* cb = &centroid[b].x;
                                 return ca[ax] < cb[ax];
                             });
        } else {
            const int a = best_axis;
            const float split = clo[a];
            auto it = std::stable_partition(
                order.begin() + s, order.begin() + e, [&](int64_t p) {
                    const float* c = &centroid[p].x;
                    int b = (int)((c[a] - clo[a]) * scale[a]);
                    b = std::min(std::max(b, 0), NBINS - 1);
                    return b <= best_bin;
                });
            mid = it - order.begin();
            if (mid == s || mid == e) mid = s + n / 2;
            (void)split;
        }

        // child bounds
        BBox lg, lcend, rg, rcent;
        for (int64_t i = s; i < mid; ++i) {
            lg.extend(prim_box(order[i]));
            lcend.extend(centroid[order[i]]);
        }
        for (int64_t i = mid; i < e; ++i) {
            rg.extend(prim_box(order[i]));
            rcent.extend(centroid[order[i]]);
        }

        int64_t node = alloc_node();
        int64_t lref, rref;
        if (n > 8192 && depth < 16) {
            auto fut = std::async(std::launch::async, [&]() {
                return build_rec(s, mid, lg, lcend, depth + 1);
            });
            rref = build_rec(mid, e, rg, rcent, depth + 1);
            lref = fut.get();
        } else {
            lref = build_rec(s, mid, lg, lcend, depth + 1);
            rref = build_rec(mid, e, rg, rcent, depth + 1);
        }
        Node2& nd = nodes[node];
        nd.child[0] = lref;
        nd.child[1] = rref;
        nd.bounds[0] = lg;
        nd.bounds[1] = rg;
        return node;
    }
};

struct WideOut {
    std::vector<float> lower, upper;
    std::vector<int32_t> child, count;
};

// BVH2 -> BVH<W> collapse (largest-area inner-child expansion,
// bvh_builder_sah.h:240-266)
static void collapse(const Builder& B, int64_t root_ref, int W, WideOut& out,
                     int64_t leaf_mult) {
    struct Entry {
        int64_t ref;
        BBox box;
    };
    if (root_ref < 0) {
        // single-leaf root: one node with one leaf child
        out.lower.assign(W * 3, FLT_MAX);
        out.upper.assign(W * 3, -FLT_MAX);
        out.child.assign(W, 0);
        out.count.assign(W, -1);
        int64_t v = -root_ref - 1;
        int64_t start = v / leaf_mult, cnt = v % leaf_mult;
        if (cnt > 0) {
            BBox b;
            for (int64_t i = start; i < start + cnt; ++i)
                b.extend(B.prim_box(B.order[i]));
            for (int a = 0; a < 3; ++a) {
                out.lower[a] = (&b.lo.x)[a];
                out.upper[a] = (&b.hi.x)[a];
            }
            out.child[0] = (int32_t)start;
            out.count[0] = (int32_t)cnt;
        }
        return;
    }

    std::vector<int64_t> wide_of(B.nodes.size(), -1);
    std::vector<int64_t> todo{root_ref};
    wide_of[root_ref] = 0;
    int64_t next_id = 1;
    std::vector<std::pair<int64_t, std::vector<Entry>>> rows;

    while (!todo.empty()) {
        int64_t ref = todo.back();
        todo.pop_back();
        std::vector<Entry> entries{
            {B.nodes[ref].child[0], B.nodes[ref].bounds[0]},
            {B.nodes[ref].child[1], B.nodes[ref].bounds[1]}};
        while ((int)entries.size() < W) {
            int best = -1;
            float best_a = -1.f;
            for (size_t i = 0; i < entries.size(); ++i) {
                if (entries[i].ref >= 0) {
                    float a = entries[i].box.half_area();
                    if (a > best_a) {
                        best_a = a;
                        best = (int)i;
                    }
                }
            }
            if (best < 0) break;
            int64_t r = entries[best].ref;
            entries.erase(entries.begin() + best);
            entries.push_back({B.nodes[r].child[0], B.nodes[r].bounds[0]});
            entries.push_back({B.nodes[r].child[1], B.nodes[r].bounds[1]});
        }
        for (auto& e : entries) {
            if (e.ref >= 0 && wide_of[e.ref] < 0) {
                wide_of[e.ref] = next_id++;
                todo.push_back(e.ref);
            }
        }
        rows.emplace_back(wide_of[ref], std::move(entries));
    }

    const int64_t M = next_id;
    out.lower.assign(M * W * 3, FLT_MAX);
    out.upper.assign(M * W * 3, -FLT_MAX);
    out.child.assign(M * W, 0);
    out.count.assign(M * W, -1);
    for (auto& row : rows) {
        int64_t m = row.first;
        for (size_t i = 0; i < row.second.size(); ++i) {
            const Entry& e = row.second[i];
            for (int a = 0; a < 3; ++a) {
                out.lower[(m * W + i) * 3 + a] = (&e.box.lo.x)[a];
                out.upper[(m * W + i) * 3 + a] = (&e.box.hi.x)[a];
            }
            if (e.ref >= 0) {
                out.child[m * W + i] = (int32_t)wide_of[e.ref];
                out.count[m * W + i] = 0;
            } else {
                int64_t v = -e.ref - 1;
                out.child[m * W + i] = (int32_t)(v / leaf_mult);
                out.count[m * W + i] = (int32_t)(v % leaf_mult);
            }
        }
    }
}

struct Result {
    WideOut wide;
    std::vector<int32_t> order32;
};

}  // namespace

// ---------------------------------------------------------------------
// Pre-split pass (RTC_BUILD_QUALITY_HIGH): duplicate large primitive
// references by chopping their boxes at longest-axis midplanes before
// the SAH build — the budget-bounded form of embree's spatial splits
// (heuristic_spatial_array.h, bounded by
// max_spatial_split_replications, state.h:113). Works on bounds alone,
// so it applies to every primitive type.
struct Ref {
    int64_t prim;
    BBox box;
};

static void presplit(std::vector<Ref>& refs, int64_t budget) {
    if (budget <= 0) return;
    auto pri = [](const Ref& r) { return r.box.half_area(); };
    auto cmp = [&](const Ref& a, const Ref& b) { return pri(a) < pri(b); };
    std::make_heap(refs.begin(), refs.end(), cmp);
    std::vector<Ref> done;
    done.reserve(refs.size() + budget);
    while (budget > 0 && !refs.empty()) {
        std::pop_heap(refs.begin(), refs.end(), cmp);
        Ref r = refs.back();
        refs.pop_back();
        float dx = r.box.hi.x - r.box.lo.x;
        float dy = r.box.hi.y - r.box.lo.y;
        float dz = r.box.hi.z - r.box.lo.z;
        int ax = dx > dy ? (dx > dz ? 0 : 2) : (dy > dz ? 1 : 2);
        float mid = 0.5f * ((&r.box.lo.x)[ax] + (&r.box.hi.x)[ax]);
        Ref a = r, b = r;
        (&a.box.hi.x)[ax] = mid;
        (&b.box.lo.x)[ax] = mid;
        refs.push_back(a);
        std::push_heap(refs.begin(), refs.end(), cmp);
        refs.push_back(b);
        std::push_heap(refs.begin(), refs.end(), cmp);
        --budget;
    }
}

extern "C" {

// Builds a BVH<branching> over prim bounds. Returns an opaque handle;
// query the arrays then free. spatial_factor > 1 enables the pre-split
// pass with ceil((spatial_factor - 1) * count) extra references.
void* et_build_sah(const float* lower, const float* upper, int64_t count,
                   int branching, int max_leaf, int min_leaf,
                   float spatial_factor) {
    auto* B = new Builder();
    B->branching = branching;
    B->max_leaf = max_leaf;
    B->min_leaf = min_leaf;
    B->leaf_mult = max_leaf + 1;

    // materialize (possibly pre-split) reference bounds
    std::vector<Ref> refs(count);
    for (int64_t i = 0; i < count; ++i) {
        refs[i].prim = i;
        refs[i].box.lo = {lower[3 * i], lower[3 * i + 1], lower[3 * i + 2]};
        refs[i].box.hi = {upper[3 * i], upper[3 * i + 1], upper[3 * i + 2]};
    }
    if (spatial_factor > 1.0f)
        presplit(refs, (int64_t)((spatial_factor - 1.0f) * count));
    const int64_t n = (int64_t)refs.size();

    auto* low = new std::vector<float>(n * 3);
    auto* upp = new std::vector<float>(n * 3);
    auto* pmap = new std::vector<int64_t>(n);
    for (int64_t i = 0; i < n; ++i) {
        (*low)[3 * i] = refs[i].box.lo.x;
        (*low)[3 * i + 1] = refs[i].box.lo.y;
        (*low)[3 * i + 2] = refs[i].box.lo.z;
        (*upp)[3 * i] = refs[i].box.hi.x;
        (*upp)[3 * i + 1] = refs[i].box.hi.y;
        (*upp)[3 * i + 2] = refs[i].box.hi.z;
        (*pmap)[i] = refs[i].prim;
    }
    B->lower = low->data();
    B->upper = upp->data();
    const int64_t P = n;
    (void)P;
    int64_t real_count = n;

    B->centroid.resize(real_count);
    B->order.resize(real_count);
    for (int64_t i = 0; i < real_count; ++i) {
        B->order[i] = i;
        B->centroid[i] = {0.5f * (B->lower[3 * i] + B->upper[3 * i]),
                          0.5f * (B->lower[3 * i + 1] + B->upper[3 * i + 1]),
                          0.5f * (B->lower[3 * i + 2] + B->upper[3 * i + 2])};
    }
    count = real_count;
    // reserve so concurrent emplace_back never reallocates (refs stay valid)
    B->nodes.reserve((size_t)count + 16);

    auto* res = new Result();
    if (count > 0) {
        int64_t root = B->build_range(0, count, 0);
        collapse(*B, root, branching, res->wide, B->leaf_mult);
    } else {
        collapse(*B, -1, branching, res->wide, B->leaf_mult);
        res->wide.count.assign(branching, -1);
    }
    res->order32.resize(count);
    for (int64_t i = 0; i < count; ++i)
        res->order32[i] = (int32_t)(*pmap)[B->order[i]];
    delete B;
    delete low;
    delete upp;
    delete pmap;
    return res;
}

int64_t et_num_refs(void* h) {
    auto* r = (Result*)h;
    return (int64_t)r->order32.size();
}

int64_t et_num_nodes(void* h, int branching) {
    auto* r = (Result*)h;
    return (int64_t)(r->wide.child.size() / branching);
}

void et_get_arrays(void* h, float* lower, float* upper, int32_t* child,
                   int32_t* count, int32_t* order) {
    auto* r = (Result*)h;
    std::memcpy(lower, r->wide.lower.data(),
                r->wide.lower.size() * sizeof(float));
    std::memcpy(upper, r->wide.upper.data(),
                r->wide.upper.size() * sizeof(float));
    std::memcpy(child, r->wide.child.data(),
                r->wide.child.size() * sizeof(int32_t));
    std::memcpy(count, r->wide.count.data(),
                r->wide.count.size() * sizeof(int32_t));
    std::memcpy(order, r->order32.data(),
                r->order32.size() * sizeof(int32_t));
}

void et_free(void* h) { delete (Result*)h; }
}
