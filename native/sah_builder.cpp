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
#include <cstdio>

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

// ---------------------------------------------------------------------
// Binned spatial splits (SBVH) — the reference-style HIGH-quality path
// (heuristic_spatial_array.h:1-578): a recursive refinement over the
// reference array that, at each range, evaluates BOTH the 32-bin object
// (centroid) split and a 16-bin SPATIAL split (references binned into
// every bin their box overlaps, with per-bin CLIPPED bounds and
// entry/exit counts), picks the cheaper SAH cost, and — when the
// spatial split wins — duplicates straddling references with
// plane-clipped boxes under a global replication budget
// (max_spatial_split_replications, state.h:113). With triangle
// vertices available the clip is the exact Sutherland-Hodgman polygon
// clip (tight boxes, splitPrimitive semantics); otherwise the box is
// chopped at the plane. Refinement stops at small ranges; the normal
// binned-SAH build then runs over the refined reference set.

constexpr int SBINS = 16;

static int clip_plane(const Vec3* in, int n, int axis, float pos,
                      bool keep_le, Vec3* out) {
    int m = 0;
    for (int i = 0; i < n; ++i) {
        const Vec3& a = in[i];
        const Vec3& b = in[(i + 1) % n];
        float fa = (&a.x)[axis] - pos, fb = (&b.x)[axis] - pos;
        bool ina = keep_le ? fa <= 0 : fa >= 0;
        bool inb = keep_le ? fb <= 0 : fb >= 0;
        if (ina) out[m++] = a;
        if (ina != inb && fa != fb) {
            float t = fa / (fa - fb);
            out[m++] = {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y),
                        a.z + t * (b.z - a.z)};
        }
    }
    return m;
}

struct SpatialCtx {
    const float* v0 = nullptr;  // (P, 3) triangle vertices (optional)
    const float* v1 = nullptr;
    const float* v2 = nullptr;
    std::atomic<int64_t> budget{0};
};

// box of ref r clipped to the half-space {c[axis] <= pos} (keep_le) or
// {>= pos}, intersected with r.box
static BBox clip_ref(const Ref& r, const SpatialCtx& ctx, int axis,
                     float pos, bool keep_le) {
    BBox out;
    if (ctx.v0) {
        Vec3 poly[8], tmp[8];
        const int64_t p = r.prim;
        poly[0] = {ctx.v0[3 * p], ctx.v0[3 * p + 1], ctx.v0[3 * p + 2]};
        poly[1] = {ctx.v1[3 * p], ctx.v1[3 * p + 1], ctx.v1[3 * p + 2]};
        poly[2] = {ctx.v2[3 * p], ctx.v2[3 * p + 1], ctx.v2[3 * p + 2]};
        int m = clip_plane(poly, 3, axis, pos, keep_le, tmp);
        for (int i = 0; i < m; ++i) out.extend(tmp[i]);
        // intersect with the (possibly already clipped) ref box
        out.lo = vmax(out.lo, r.box.lo);
        out.hi = vmin(out.hi, r.box.hi);
        if (out.lo.x > out.hi.x || out.lo.y > out.hi.y ||
            out.lo.z > out.hi.z) {
            // degenerate (clip removed everything): fall back to chop
            out = r.box;
            if (keep_le) (&out.hi.x)[axis] = pos;
            else (&out.lo.x)[axis] = pos;
        }
    } else {
        out = r.box;
        if (keep_le) (&out.hi.x)[axis] = std::min((&out.hi.x)[axis], pos);
        else (&out.lo.x)[axis] = std::max((&out.lo.x)[axis], pos);
    }
    return out;
}

// Full SBVH builder over a reference vector: the spatial/object split
// decision IS the tree (a two-pass refine-then-rebuild loses the
// refinement's structure — measured WORSE trees). Mirrors
// BVHBuilderFastSpatialSAH: per node, 32-bin object split and (when the
// object children overlap) a 16-bin spatial split with entry/exit
// counts and clipped bin bounds; the cheaper wins; straddlers duplicate
// under the global budget. Leaves append their refs to a shared array.
struct SpatialBuilder {
    Builder* B;
    SpatialCtx* ctx;
    std::vector<Ref> leaf_refs;
    std::mutex leaf_mutex;

    int64_t make_leaf(std::vector<Ref>& cur) {
        std::lock_guard<std::mutex> g(leaf_mutex);
        int64_t s = (int64_t)leaf_refs.size();
        leaf_refs.insert(leaf_refs.end(), cur.begin(), cur.end());
        return -(s * B->leaf_mult + (int64_t)cur.size() + 1);
    }

    int64_t rec(std::vector<Ref> cur, int depth) {
        const int64_t n = (int64_t)cur.size();
        if (n <= B->min_leaf) return make_leaf(cur);

        BBox geom, cent;
        for (const Ref& r : cur) {
            geom.extend(r.box);
            Vec3 cc3 = {0.5f * (r.box.lo.x + r.box.hi.x),
                        0.5f * (r.box.lo.y + r.box.hi.y),
                        0.5f * (r.box.lo.z + r.box.hi.z)};
            cent.extend(cc3);
        }

        // ---- object (centroid) split, 32 bins ------------------------
        float ext[3] = {cent.hi.x - cent.lo.x, cent.hi.y - cent.lo.y,
                        cent.hi.z - cent.lo.z};
        float cscale[3];
        for (int a = 0; a < 3; ++a)
            cscale[a] = ext[a] > 0 ? NBINS * (1.f - 1e-6f) / ext[a] : 0.f;
        const float clo[3] = {cent.lo.x, cent.lo.y, cent.lo.z};
        int64_t ocounts[3][NBINS] = {};
        BBox obins[3][NBINS];
        for (const Ref& r : cur) {
            const float cc[3] = {0.5f * (r.box.lo.x + r.box.hi.x),
                                 0.5f * (r.box.lo.y + r.box.hi.y),
                                 0.5f * (r.box.lo.z + r.box.hi.z)};
            for (int a = 0; a < 3; ++a) {
                int b = (int)((cc[a] - clo[a]) * cscale[a]);
                b = std::min(std::max(b, 0), NBINS - 1);
                ocounts[a][b]++;
                obins[a][b].extend(r.box);
            }
        }
        float obj_cost = FLT_MAX;
        int obj_axis = -1, obj_bin = -1;
        BBox obj_l, obj_r;
        for (int a = 0; a < 3; ++a) {
            if (ext[a] <= 0) continue;
            BBox racc_box[NBINS];
            int64_t rcount[NBINS];
            BBox acc;
            int64_t rc = 0;
            for (int b = NBINS - 1; b >= 1; --b) {
                acc.extend(obins[a][b]);
                rc += ocounts[a][b];
                racc_box[b] = acc;
                rcount[b] = rc;
            }
            BBox lacc;
            int64_t lc = 0;
            for (int b = 0; b < NBINS - 1; ++b) {
                lacc.extend(obins[a][b]);
                lc += ocounts[a][b];
                if (lc == 0 || rcount[b + 1] == 0) continue;
                float cost = lacc.half_area() * lc +
                             racc_box[b + 1].half_area() * rcount[b + 1];
                if (cost < obj_cost) {
                    obj_cost = cost;
                    obj_axis = a;
                    obj_bin = b;
                    obj_l = lacc;
                    obj_r = racc_box[b + 1];
                }
            }
        }

        // ---- spatial split, 16 bins (gated on object-child overlap) --
        bool try_spatial = false;
        if (obj_axis >= 0 && n >= 16 && ctx->budget.load() > 0) {
            BBox ov;
            ov.lo = vmax(obj_l.lo, obj_r.lo);
            ov.hi = vmin(obj_l.hi, obj_r.hi);
            if (ov.lo.x <= ov.hi.x && ov.lo.y <= ov.hi.y &&
                ov.lo.z <= ov.hi.z)
                try_spatial = ov.half_area() > 1e-5f * geom.half_area();
        }
        float sp_cost = FLT_MAX;
        int sp_axis = -1;
        float sp_pos = 0.f;
        if (try_spatial) {
            const float glo[3] = {geom.lo.x, geom.lo.y, geom.lo.z};
            float gext[3] = {geom.hi.x - geom.lo.x, geom.hi.y - geom.lo.y,
                             geom.hi.z - geom.lo.z};
            for (int a = 0; a < 3; ++a) {
                if (gext[a] <= 0) continue;
                const float inv = SBINS * (1.f - 1e-6f) / gext[a];
                const float binw = gext[a] / SBINS;
                int64_t enter[SBINS] = {}, exitc[SBINS] = {};
                BBox sbins[SBINS];
                for (const Ref& r : cur) {
                    int b0 = (int)(((&r.box.lo.x)[a] - glo[a]) * inv);
                    int b1 = (int)(((&r.box.hi.x)[a] - glo[a]) * inv);
                    b0 = std::min(std::max(b0, 0), SBINS - 1);
                    b1 = std::min(std::max(b1, 0), SBINS - 1);
                    enter[b0]++;
                    exitc[b1]++;
                    if (b0 == b1) {
                        sbins[b0].extend(r.box);
                    } else {
                        for (int b = b0; b <= b1; ++b) {
                            float lo_p = glo[a] + b * binw;
                            float hi_p = glo[a] + (b + 1) * binw;
                            BBox piece = r.box;
                            if (b > b0)
                                piece = clip_ref(r, *ctx, a, lo_p, false);
                            if (b < b1) {
                                Ref rr{r.prim, piece};
                                piece = clip_ref(rr, *ctx, a, hi_p, true);
                            }
                            sbins[b].extend(piece);
                        }
                    }
                }
                BBox racc_box[SBINS];
                int64_t rcnt[SBINS];
                BBox acc;
                int64_t rc = 0;
                for (int b = SBINS - 1; b >= 1; --b) {
                    acc.extend(sbins[b]);
                    rc += exitc[b];
                    racc_box[b] = acc;
                    rcnt[b] = rc;
                }
                BBox lacc;
                int64_t lcnt = 0;
                for (int b = 0; b < SBINS - 1; ++b) {
                    lacc.extend(sbins[b]);
                    lcnt += enter[b];
                    if (lcnt == 0 || rcnt[b + 1] == 0) continue;
                    float cost = lacc.half_area() * lcnt +
                                 racc_box[b + 1].half_area() * rcnt[b + 1];
                    if (cost < sp_cost) {
                        sp_cost = cost;
                        sp_axis = a;
                        sp_pos = glo[a] + (b + 1) * binw;
                    }
                }
            }
        }

        // ---- leaf / split decision (bvh_builder_sah.h:216-222) -------
        const float best_cost = std::min(obj_cost, sp_cost);
        const float area = geom.half_area();
        if (n <= B->max_leaf &&
            (obj_axis < 0 || B->intcost * n * area <=
                                 B->travcost * area + B->intcost * best_cost))
            return make_leaf(cur);

        // ---- partition ----------------------------------------------
        std::vector<Ref> L, R;
        L.reserve(n / 2 + 16);
        R.reserve(n / 2 + 16);
        if (sp_axis >= 0 && sp_cost < obj_cost) {
            for (const Ref& r : cur) {
                const float lo = (&r.box.lo.x)[sp_axis];
                const float hi = (&r.box.hi.x)[sp_axis];
                if (hi <= sp_pos) {
                    L.push_back(r);
                } else if (lo >= sp_pos) {
                    R.push_back(r);
                } else if (ctx->budget.fetch_sub(1) > 0) {
                    L.push_back(
                        {r.prim, clip_ref(r, *ctx, sp_axis, sp_pos, true)});
                    R.push_back(
                        {r.prim, clip_ref(r, *ctx, sp_axis, sp_pos, false)});
                } else {
                    if (sp_pos - lo >= hi - sp_pos) L.push_back(r);
                    else R.push_back(r);
                }
            }
        } else if (obj_axis >= 0) {
            for (const Ref& r : cur) {
                const float c = 0.5f * ((&r.box.lo.x)[obj_axis] +
                                        (&r.box.hi.x)[obj_axis]);
                int b = (int)((c - clo[obj_axis]) * cscale[obj_axis]);
                b = std::min(std::max(b, 0), NBINS - 1);
                if (b <= obj_bin) L.push_back(r);
                else R.push_back(r);
            }
        }
        if (L.empty() || R.empty()) {
            // median fallback on the largest-extent axis
            L.clear();
            R.clear();
            int ax = 0;
            if (ext[1] > ext[ax]) ax = 1;
            if (ext[2] > ext[ax]) ax = 2;
            std::nth_element(
                cur.begin(), cur.begin() + n / 2, cur.end(),
                [&](const Ref& a, const Ref& b) {
                    return (&a.box.lo.x)[ax] + (&a.box.hi.x)[ax] <
                           (&b.box.lo.x)[ax] + (&b.box.hi.x)[ax];
                });
            L.assign(cur.begin(), cur.begin() + n / 2);
            R.assign(cur.begin() + n / 2, cur.end());
        }
        cur.clear();
        cur.shrink_to_fit();

        BBox lg, rg;
        for (const Ref& r : L) lg.extend(r.box);
        for (const Ref& r : R) rg.extend(r.box);

        int64_t node = B->alloc_node();
        int64_t lref, rref;
        if ((int64_t)(L.size() + R.size()) > 8192 && depth < 16) {
            auto fut = std::async(std::launch::async, [&]() {
                return rec(std::move(L), depth + 1);
            });
            rref = rec(std::move(R), depth + 1);
            lref = fut.get();
        } else {
            lref = rec(std::move(L), depth + 1);
            rref = rec(std::move(R), depth + 1);
        }
        Node2& nd = B->nodes[node];
        nd.child[0] = lref;
        nd.child[1] = rref;
        nd.bounds[0] = lg;
        nd.bounds[1] = rg;
        return node;
    }
};


extern "C" {

// Builds a BVH<branching> over prim bounds. Returns an opaque handle;
// query the arrays then free. spatial_factor > 1 enables binned spatial
// splits (SBVH) with a budget of ceil((spatial_factor - 1) * count)
// reference duplications; v0/v1/v2 (optional, may be null) supply
// triangle vertices for exact plane clipping.
static void* build_sah_impl(const float* lower, const float* upper,
                            const float* v0, const float* v1,
                            const float* v2, int64_t count,
                            int branching, int max_leaf, int min_leaf,
                            float spatial_factor) {
    auto* B = new Builder();
    B->branching = branching;
    B->max_leaf = max_leaf;
    B->min_leaf = min_leaf;
    B->leaf_mult = max_leaf + 1;

    // materialize (possibly spatially split) reference bounds
    std::vector<Ref> refs(count);
    for (int64_t i = 0; i < count; ++i) {
        refs[i].prim = i;
        refs[i].box.lo = {lower[3 * i], lower[3 * i + 1], lower[3 * i + 2]};
        refs[i].box.hi = {upper[3 * i], upper[3 * i + 1], upper[3 * i + 2]};
    }
    if (spatial_factor > 1.0f && count > 0) {
        // SBVH path: the spatial/object decision tree IS the BVH
        const int64_t budget = (int64_t)((spatial_factor - 1.0f) * count);
        SpatialCtx ctx;
        ctx.v0 = v0;
        ctx.v1 = v1;
        ctx.v2 = v2;
        ctx.budget.store(budget);
        B->nodes.reserve(2 * (size_t)(count + budget) + 16);
        SpatialBuilder SB;
        SB.B = B;
        SB.ctx = &ctx;
        SB.leaf_refs.reserve(count + budget);
        int64_t root = SB.rec(std::move(refs), 0);
        const int64_t nr = (int64_t)SB.leaf_refs.size();
        auto* low = new std::vector<float>(nr * 3);
        auto* upp = new std::vector<float>(nr * 3);
        auto* pmap = new std::vector<int64_t>(nr);
        for (int64_t i = 0; i < nr; ++i) {
            const Ref& r = SB.leaf_refs[i];
            (*low)[3 * i] = r.box.lo.x;
            (*low)[3 * i + 1] = r.box.lo.y;
            (*low)[3 * i + 2] = r.box.lo.z;
            (*upp)[3 * i] = r.box.hi.x;
            (*upp)[3 * i + 1] = r.box.hi.y;
            (*upp)[3 * i + 2] = r.box.hi.z;
            (*pmap)[i] = r.prim;
        }
        B->lower = low->data();
        B->upper = upp->data();
        B->order.resize(nr);
        for (int64_t i = 0; i < nr; ++i) B->order[i] = i;
        auto* res = new Result();
        collapse(*B, root, branching, res->wide, B->leaf_mult);
        res->order32.resize(nr);
        for (int64_t i = 0; i < nr; ++i)
            res->order32[i] = (int32_t)(*pmap)[i];
        delete B;
        delete low;
        delete upp;
        delete pmap;
        return res;
    }
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

void* et_build_sah(const float* lower, const float* upper, int64_t count,
                   int branching, int max_leaf, int min_leaf,
                   float spatial_factor) {
    return build_sah_impl(lower, upper, nullptr, nullptr, nullptr, count,
                          branching, max_leaf, min_leaf, spatial_factor);
}

// triangle-aware variant: exact polygon clipping during spatial splits
void* et_build_sah_tri(const float* lower, const float* upper,
                       const float* v0, const float* v1, const float* v2,
                       int64_t count, int branching, int max_leaf,
                       int min_leaf, float spatial_factor) {
    return build_sah_impl(lower, upper, v0, v1, v2, count, branching,
                          max_leaf, min_leaf, spatial_factor);
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
