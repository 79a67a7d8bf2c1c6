// First-party host geometry library: contour extraction and polygon
// analysis for binary line masks.
//
// The reference delegates all contour topology to OpenCV
// (reference: BDRC/line_detection.py:33-44 findContours RETR_LIST +
// CHAIN_APPROX_SIMPLE, minAreaRect/convexHull/boundingRect call sites
// throughout). This library provides the framework's own native
// implementation of that capability behind a C ABI consumed via ctypes:
//
//  - connected-components labeling (8-connectivity, BFS) + Moore
//    border tracing with Jacob's stopping criterion (one outer contour per
//    component; hole borders are dropped — they carry no information for
//    the line pipeline) and direction-change point compression
//    (CHAIN_APPROX_SIMPLE-style);
//  - shoelace contour area;
//  - Andrew monotone-chain convex hull;
//  - rotating-calipers minimum-area rectangle.
//
// Build: g++ -O3 -shared -fPIC geometry.cpp -o libocr_geometry.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

namespace {

struct Point {
    int32_t x;
    int32_t y;
};

// 8-neighborhood clockwise starting at west (matches Moore tracing with
// backtrack entry)
static const int DX[8] = {-1, -1, 0, 1, 1, 1, 0, -1};
static const int DY[8] = {0, -1, -1, -1, 0, 1, 1, 1};

// Trace the outer boundary of the component whose topmost-leftmost pixel is
// (sy, sx). Standard Moore-neighbor tracing, entering from the west,
// stopping when the start pixel is re-entered from the same direction.
static void trace_boundary(const uint8_t* img, int h, int w, int sy, int sx,
                           std::vector<Point>& contour) {
    auto fg = [&](int y, int x) -> bool {
        return y >= 0 && y < h && x >= 0 && x < w && img[y * w + x] != 0;
    };

    contour.push_back({sx, sy});
    // check isolated pixel
    bool isolated = true;
    for (int d = 0; d < 8; ++d)
        if (fg(sy + DY[d], sx + DX[d])) { isolated = false; break; }
    if (isolated) return;

    int cy = sy, cx = sx;
    int enter = 0;  // we conceptually entered the start pixel from the west
    int start_exit = -1;
    size_t guard = (size_t)4 * h * w + 16;

    while (guard--) {
        // scan clockwise starting just after the backtrack direction
        int next = -1;
        for (int k = 1; k <= 8; ++k) {
            int d = (enter + k) % 8;
            if (fg(cy + DY[d], cx + DX[d])) { next = d; break; }
        }
        if (next < 0) return;  // unreachable: not isolated
        if (cy == sy && cx == sx) {
            if (start_exit < 0)
                start_exit = next;
            else if (next == start_exit)
                return;  // Jacob's criterion: same exit from start again
        }
        cy += DY[next];
        cx += DX[next];
        contour.push_back({cx, cy});
        // new backtrack direction: where we came from
        enter = (next + 4) % 8;
        if (cy == sy && cx == sx) {
            // arrived back at start; loop once more to test exit direction
            contour.pop_back();
        }
    }
}

// Compress a contour: keep only direction changes (CHAIN_APPROX_SIMPLE).
static void compress(const std::vector<Point>& in, std::vector<Point>& out) {
    size_t n = in.size();
    if (n <= 2) { out = in; return; }
    out.clear();
    for (size_t i = 0; i < n; ++i) {
        const Point& p0 = in[(i + n - 1) % n];
        const Point& p1 = in[i];
        const Point& p2 = in[(i + 1) % n];
        int dx1 = p1.x - p0.x, dy1 = p1.y - p0.y;
        int dx2 = p2.x - p1.x, dy2 = p2.y - p1.y;
        if (dx1 != dx2 || dy1 != dy2) out.push_back(p1);
    }
    if (out.empty()) out.push_back(in[0]);
}

}  // namespace

extern "C" {

// Find one outer contour per 8-connected component. Points are written as
// x,y pairs into out_points with per-contour offsets (prefix sums,
// n_contours+1 entries) in out_offsets. Returns the number of contours, or
// -1 (points overflow) / -2 (contour count overflow).
int ocr_find_contours(const uint8_t* mask, int h, int w,
                      int32_t* out_points, int64_t max_points,
                      int64_t* out_offsets, int max_contours) {
    std::vector<int32_t> label((size_t)h * w, 0);
    std::vector<int32_t> stack;
    int n_contours = 0;
    int64_t cursor = 0;
    int32_t next_label = 0;
    std::vector<Point> contour, packed;

    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            if (!mask[y * w + x] || label[y * w + x]) continue;
            // new component: first pixel in scan order is topmost-leftmost
            ++next_label;
            stack.clear();
            stack.push_back(y * w + x);
            label[y * w + x] = next_label;
            while (!stack.empty()) {
                int idx = stack.back();
                stack.pop_back();
                int py = idx / w, px = idx % w;
                for (int d = 0; d < 8; ++d) {
                    int ny = py + DY[d], nx = px + DX[d];
                    if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
                    int nidx = ny * w + nx;
                    if (mask[nidx] && !label[nidx]) {
                        label[nidx] = next_label;
                        stack.push_back(nidx);
                    }
                }
            }
            contour.clear();
            trace_boundary(mask, h, w, y, x, contour);
            compress(contour, packed);
            if (n_contours >= max_contours) return -2;
            if (cursor + (int64_t)packed.size() * 2 > max_points) return -1;
            out_offsets[n_contours] = cursor / 2;
            for (const Point& p : packed) {
                out_points[cursor++] = p.x;
                out_points[cursor++] = p.y;
            }
            ++n_contours;
        }
    }
    out_offsets[n_contours] = cursor / 2;
    return n_contours;
}

double ocr_contour_area(const int32_t* points, int n) {
    double area = 0.0;
    for (int i = 0; i < n; ++i) {
        int j = (i + 1) % n;
        double x1 = points[2 * i], y1 = points[2 * i + 1];
        double x2 = points[2 * j], y2 = points[2 * j + 1];
        area += x1 * y2 - x2 * y1;
    }
    return std::fabs(area) * 0.5;
}

void ocr_bounding_rect(const int32_t* points, int n, int32_t* out_xywh) {
    int32_t minx = points[0], maxx = points[0];
    int32_t miny = points[1], maxy = points[1];
    for (int i = 1; i < n; ++i) {
        minx = std::min(minx, points[2 * i]);
        maxx = std::max(maxx, points[2 * i]);
        miny = std::min(miny, points[2 * i + 1]);
        maxy = std::max(maxy, points[2 * i + 1]);
    }
    out_xywh[0] = minx;
    out_xywh[1] = miny;
    out_xywh[2] = maxx - minx + 1;
    out_xywh[3] = maxy - miny + 1;
}

// Andrew monotone chain; returns hull size, writes x,y pairs (counter-
// clockwise in image coordinates).
int ocr_convex_hull(const int32_t* points, int n, int32_t* out_points) {
    std::vector<Point> pts(n);
    for (int i = 0; i < n; ++i) pts[i] = {points[2 * i], points[2 * i + 1]};
    std::sort(pts.begin(), pts.end(), [](const Point& a, const Point& b) {
        return a.x < b.x || (a.x == b.x && a.y < b.y);
    });
    pts.erase(std::unique(pts.begin(), pts.end(),
                          [](const Point& a, const Point& b) {
                              return a.x == b.x && a.y == b.y;
                          }),
              pts.end());
    n = (int)pts.size();
    if (n <= 2) {
        for (int i = 0; i < n; ++i) {
            out_points[2 * i] = pts[i].x;
            out_points[2 * i + 1] = pts[i].y;
        }
        return n;
    }
    auto cross = [](const Point& o, const Point& a, const Point& b) {
        return (int64_t)(a.x - o.x) * (b.y - o.y) -
               (int64_t)(a.y - o.y) * (b.x - o.x);
    };
    std::vector<Point> hull(2 * (size_t)n);
    int k = 0;
    for (int i = 0; i < n; ++i) {
        while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
        hull[k++] = pts[i];
    }
    int lower = k + 1;
    for (int i = n - 2; i >= 0; --i) {
        while (k >= lower && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
        hull[k++] = pts[i];
    }
    k -= 1;  // last point equals first
    for (int i = 0; i < k; ++i) {
        out_points[2 * i] = hull[i].x;
        out_points[2 * i + 1] = hull[i].y;
    }
    return k;
}

double ocr_arc_length(const int32_t* points, int n, int closed) {
    if (n < 2) return 0.0;
    double total = 0.0;
    int last = closed ? n : n - 1;
    for (int i = 0; i < last; ++i) {
        int j = (i + 1) % n;
        double dx = points[2 * j] - points[2 * i];
        double dy = points[2 * j + 1] - points[2 * i + 1];
        total += std::hypot(dx, dy);
    }
    return total;
}

namespace {

// Perpendicular distance of p to segment (a, b).
static double seg_dist(const Point& p, const Point& a, const Point& b) {
    double ex = b.x - a.x, ey = b.y - a.y;
    double len2 = ex * ex + ey * ey;
    if (len2 == 0.0) return std::hypot((double)p.x - a.x, (double)p.y - a.y);
    double cross = ex * (p.y - a.y) - ey * (p.x - a.x);
    return std::fabs(cross) / std::sqrt(len2);
}

// Recursive Douglas-Peucker over in[lo..hi] (inclusive endpoints kept).
static void dp_recurse(const std::vector<Point>& in, int lo, int hi,
                       double eps, std::vector<char>& keep) {
    if (hi - lo < 2) return;
    double best = -1.0;
    int best_i = -1;
    for (int i = lo + 1; i < hi; ++i) {
        double d = seg_dist(in[i], in[lo], in[hi]);
        if (d > best) { best = d; best_i = i; }
    }
    if (best > eps) {
        keep[best_i] = 1;
        dp_recurse(in, lo, best_i, eps, keep);
        dp_recurse(in, best_i, hi, eps, keep);
    }
}

}  // namespace

// Douglas-Peucker polygon simplification. For closed curves the two anchor
// points are the pair of mutually-farthest vertices (the classic closed-DP
// split), so results are rotation-of-start-point invariant. Writes the kept
// points in input order; returns their count.
int ocr_approx_poly_dp(const int32_t* points, int n, double epsilon,
                       int closed, int32_t* out_points) {
    std::vector<Point> pts(n);
    for (int i = 0; i < n; ++i) pts[i] = {points[2 * i], points[2 * i + 1]};
    std::vector<char> keep(n, 0);
    if (n <= 2) {
        for (int i = 0; i < n; ++i) keep[i] = 1;
    } else if (!closed) {
        keep[0] = keep[n - 1] = 1;
        dp_recurse(pts, 0, n - 1, epsilon, keep);
    } else {
        // farthest point from vertex 0, then farthest from that
        auto d2 = [&](const Point& a, const Point& b) {
            double dx = a.x - b.x, dy = a.y - b.y;
            return dx * dx + dy * dy;
        };
        int a = 0;
        for (int i = 1; i < n; ++i)
            if (d2(pts[i], pts[0]) > d2(pts[a], pts[0])) a = i;
        int b = 0;
        for (int i = 0; i < n; ++i)
            if (d2(pts[i], pts[a]) > d2(pts[b], pts[a])) b = i;
        if (a == b) {
            keep[0] = 1;  // degenerate: all points identical
        } else {
            if (a > b) std::swap(a, b);
            keep[a] = keep[b] = 1;
            dp_recurse(pts, a, b, epsilon, keep);
            // wrap-around arc b -> n-1, 0 -> a as one unrolled segment
            std::vector<Point> arc;
            std::vector<int> idx;
            for (int i = b; i < n; ++i) { arc.push_back(pts[i]); idx.push_back(i); }
            for (int i = 0; i <= a; ++i) { arc.push_back(pts[i]); idx.push_back(i); }
            std::vector<char> arc_keep(arc.size(), 0);
            arc_keep.front() = arc_keep.back() = 1;
            dp_recurse(arc, 0, (int)arc.size() - 1, epsilon, arc_keep);
            for (size_t i = 1; i + 1 < arc.size(); ++i)
                if (arc_keep[i]) keep[idx[i]] = 1;
        }
    }
    int k = 0;
    for (int i = 0; i < n; ++i) {
        if (!keep[i]) continue;
        out_points[2 * k] = pts[i].x;
        out_points[2 * k + 1] = pts[i].y;
        ++k;
    }
    return k;
}

// Rotating calipers over the convex hull; writes cx, cy, w, h, angle_deg.
void ocr_min_area_rect(const int32_t* points, int n, double* out5) {
    std::vector<int32_t> hull(2 * (size_t)(n + 1));
    int hn = ocr_convex_hull(points, n, hull.data());
    if (hn == 0) {
        out5[0] = out5[1] = out5[2] = out5[3] = out5[4] = 0;
        return;
    }
    if (hn <= 2) {
        double x0 = hull[0], y0 = hull[1];
        double x1 = hn == 2 ? hull[2] : x0, y1 = hn == 2 ? hull[3] : y0;
        out5[0] = (x0 + x1) / 2;
        out5[1] = (y0 + y1) / 2;
        out5[2] = std::hypot(x1 - x0, y1 - y0);
        out5[3] = 0;
        out5[4] = std::atan2(y1 - y0, x1 - x0) * 180.0 / M_PI;
        return;
    }
    double best_area = 1e300;
    for (int i = 0; i < hn; ++i) {
        int j = (i + 1) % hn;
        double ex = hull[2 * j] - hull[2 * i];
        double ey = hull[2 * j + 1] - hull[2 * i + 1];
        double len = std::hypot(ex, ey);
        if (len == 0) continue;
        ex /= len;
        ey /= len;
        double min_u = 1e300, max_u = -1e300, min_v = 1e300, max_v = -1e300;
        for (int p = 0; p < hn; ++p) {
            double px = hull[2 * p], py = hull[2 * p + 1];
            double u = px * ex + py * ey;
            double v = -px * ey + py * ex;
            min_u = std::min(min_u, u);
            max_u = std::max(max_u, u);
            min_v = std::min(min_v, v);
            max_v = std::max(max_v, v);
        }
        double area = (max_u - min_u) * (max_v - min_v);
        if (area < best_area) {
            best_area = area;
            double cu = (min_u + max_u) / 2, cv = (min_v + max_v) / 2;
            out5[0] = cu * ex - cv * ey;
            out5[1] = cu * ey + cv * ex;
            out5[2] = max_u - min_u;
            out5[3] = max_v - min_v;
            out5[4] = std::atan2(ey, ex) * 180.0 / M_PI;
        }
    }
}

}  // extern "C"
