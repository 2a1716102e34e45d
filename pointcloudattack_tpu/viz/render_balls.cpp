// Software z-buffer ball renderer for point-cloud visualization.
//
// TPU-framework counterpart of the reference's single native component
// (reference utils/render_balls_so.cpp, built by scripts/build.sh and
// loaded via ctypes in utils/show3d_balls.py:22).  This is a fresh
// implementation: each point is splatted as a shaded disc of radius r
// with per-pixel depth testing; discs are shaded with a simple
// sqrt-falloff to fake sphere lighting.
//
// Build:  g++ -O3 -shared -fPIC -o render_balls.bin render_balls.cpp
//
// C ABI (see viz/render.py):
//   render_balls(image, h, w, zbuf, xyz, color, n, radius)
//     image : uint8 [h, w, 3], pre-cleared by the caller
//     zbuf  : float [h, w], pre-filled with -inf by the caller
//     xyz   : float [n, 3], x right / y down in pixels, z toward viewer
//     color : float [n, 3] in [0, 255]
//     radius: disc radius in pixels

#include <cmath>
#include <cstdint>

extern "C" {

void render_balls(std::uint8_t* image, int h, int w, float* zbuf,
                  const float* xyz, const float* color, int n,
                  int radius) {
    const int r2 = radius * radius;
    for (int i = 0; i < n; ++i) {
        const float cx = xyz[i * 3 + 0];
        const float cy = xyz[i * 3 + 1];
        const float cz = xyz[i * 3 + 2];
        const int x0 = static_cast<int>(cx);
        const int y0 = static_cast<int>(cy);
        for (int dy = -radius; dy <= radius; ++dy) {
            const int py = y0 + dy;
            if (py < 0 || py >= h) continue;
            for (int dx = -radius; dx <= radius; ++dx) {
                const int px = x0 + dx;
                if (px < 0 || px >= w) continue;
                const int d2 = dx * dx + dy * dy;
                if (d2 > r2) continue;
                // sphere-ish depth bump so overlapping balls intersect
                const float bump =
                    std::sqrt(static_cast<float>(r2 - d2));
                const float z = cz + bump;
                const int pix = py * w + px;
                if (z <= zbuf[pix]) continue;
                zbuf[pix] = z;
                // radial shading: bright center, dark rim
                const float shade =
                    0.4f + 0.6f * (bump / (radius > 0 ? radius : 1));
                for (int c = 0; c < 3; ++c) {
                    float v = color[i * 3 + c] * shade;
                    if (v < 0.f) v = 0.f;
                    if (v > 255.f) v = 255.f;
                    image[pix * 3 + c] = static_cast<std::uint8_t>(v);
                }
            }
        }
    }
}

}  // extern "C"
