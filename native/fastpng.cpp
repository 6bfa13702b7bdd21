// fastpng — C++ PNG -> RGB8 decoder for the serving host's image prep path.
//
// The inference engine decodes every incoming page image on the host
// (karanta_tpu/inference/engine.py:_decode_image); on the small 1-2 core
// hosts that front a TPU, PIL's PNG path (~18 ms for a 1288 px page) is the
// single most expensive host step once resize runs on-device. This decoder
// handles the common OCR-page case — 8-bit, non-interlaced gray/RGB/RGBA/
// palette PNGs — in one inflate + one unfilter pass straight into an RGB
// buffer, and reports anything else as unsupported so the caller falls back
// to PIL. CPython extension (no pybind11 in this image), system zlib.
//
// Exposed functions:
//   decode_rgb(data: bytes) -> (rgb: bytes, height: int, width: int)
//     raises ValueError on malformed/unsupported input.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct PngImage {
    uint32_t width = 0;
    uint32_t height = 0;
    int bit_depth = 0;
    int color_type = 0;
    int channels = 0;
    std::vector<uint8_t> palette;  // 3 * n RGB entries
    std::vector<uint8_t> raw;      // unfiltered scanline data
};

static uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

// Inflate the concatenated IDAT payload into `out` (exact expected size).
static bool inflate_idat(const std::vector<std::pair<const uint8_t*, size_t>>&
                             spans,
                         std::vector<uint8_t>& out, std::string& err) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) {
        err = "zlib init failed";
        return false;
    }
    zs.next_out = out.data();
    zs.avail_out = static_cast<uInt>(out.size());
    int ret = Z_OK;
    for (size_t i = 0; i < spans.size() && ret != Z_STREAM_END; i++) {
        zs.next_in = const_cast<Bytef*>(spans[i].first);
        zs.avail_in = static_cast<uInt>(spans[i].second);
        ret = inflate(&zs, Z_NO_FLUSH);
        if (ret != Z_OK && ret != Z_STREAM_END) {
            inflateEnd(&zs);
            err = "corrupt zlib stream";
            return false;
        }
    }
    bool ok = (zs.avail_out == 0);
    inflateEnd(&zs);
    if (!ok) err = "truncated image data";
    return ok;
}

// Parse + inflate + unfilter. Returns false with err="unsupported: ..." for
// valid-but-unhandled variants (caller falls back to PIL) or a parse error.
static bool decode_png(const uint8_t* data, size_t size, PngImage& img,
                       std::string& err) {
    static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A,
                                    0x0A};
    if (size < 8 + 25 || std::memcmp(data, kSig, 8) != 0) {
        err = "not a PNG";
        return false;
    }
    size_t pos = 8;
    std::vector<std::pair<const uint8_t*, size_t>> idat;
    bool saw_ihdr = false, saw_iend = false;
    while (pos + 8 <= size && !saw_iend) {
        uint32_t len = be32(data + pos);
        if (pos + 12 + size_t(len) > size) {
            err = "truncated chunk";
            return false;
        }
        const uint8_t* type = data + pos + 4;
        const uint8_t* body = data + pos + 8;
        if (std::memcmp(type, "IHDR", 4) == 0) {
            if (len != 13) {
                err = "bad IHDR";
                return false;
            }
            img.width = be32(body);
            img.height = be32(body + 4);
            img.bit_depth = body[8];
            img.color_type = body[9];
            int interlace = body[12];
            // cap below PIL's ~179M-pixel decompression-bomb threshold so a
            // tiny malicious PNG can't make us allocate gigabytes that the
            // PIL fallback path would refuse (Image.MAX_IMAGE_PIXELS)
            if (img.width == 0 || img.height == 0 ||
                uint64_t(img.width) * img.height > (1u << 27)) {
                err = "unsupported: image too large";
                return false;
            }
            if (img.bit_depth != 8 || interlace != 0) {
                err = "unsupported: bit depth / interlace";
                return false;
            }
            switch (img.color_type) {
                case 0: img.channels = 1; break;  // gray
                case 2: img.channels = 3; break;  // rgb
                case 3: img.channels = 1; break;  // palette
                case 4: img.channels = 2; break;  // gray+alpha
                case 6: img.channels = 4; break;  // rgba
                default:
                    err = "unsupported: color type";
                    return false;
            }
            saw_ihdr = true;
        } else if (std::memcmp(type, "PLTE", 4) == 0) {
            img.palette.assign(body, body + len);
        } else if (std::memcmp(type, "IDAT", 4) == 0) {
            idat.emplace_back(body, len);
        } else if (std::memcmp(type, "IEND", 4) == 0) {
            saw_iend = true;
        }
        // ancillary chunks (tRNS transparency is intentionally dropped —
        // the engine flattens to RGB) are skipped
        pos += 12 + len;
    }
    if (!saw_ihdr || idat.empty()) {
        err = "missing IHDR/IDAT";
        return false;
    }
    if (img.color_type == 3 && img.palette.empty()) {
        err = "palette image without PLTE";
        return false;
    }

    const size_t stride = size_t(img.width) * img.channels;
    img.raw.resize((stride + 1) * img.height);
    if (!inflate_idat(idat, img.raw, err)) return false;

    // unfilter in place: row i lives at raw[(stride+1)*i], first byte is the
    // filter id; the defiltered pixels shift into a packed layout as we go
    const int bpp = img.channels;  // bytes per pixel (8-bit depth)
    uint8_t* out = img.raw.data();
    for (uint32_t y = 0; y < img.height; y++) {
        const uint8_t* src = img.raw.data() + (stride + 1) * y;
        int filter = src[0];
        uint8_t* row = out + stride * y;
        const uint8_t* prev = (y > 0) ? out + stride * (y - 1) : nullptr;
        std::memmove(row, src + 1, stride);
        switch (filter) {
            case 0:
                break;
            case 1:  // sub
                for (size_t x = bpp; x < stride; x++) row[x] += row[x - bpp];
                break;
            case 2:  // up
                if (prev)
                    for (size_t x = 0; x < stride; x++) row[x] += prev[x];
                break;
            case 3:  // average
                if (prev) {
                    for (int x = 0; x < bpp; x++) row[x] += prev[x] >> 1;
                    for (size_t x = bpp; x < stride; x++)
                        row[x] += uint8_t((row[x - bpp] + prev[x]) >> 1);
                } else {
                    for (size_t x = bpp; x < stride; x++)
                        row[x] += row[x - bpp] >> 1;
                }
                break;
            case 4:  // paeth
                if (prev) {
                    for (int x = 0; x < bpp; x++) row[x] += prev[x];
                    for (size_t x = bpp; x < stride; x++)
                        row[x] += uint8_t(
                            paeth(row[x - bpp], prev[x], prev[x - bpp]));
                } else {
                    for (size_t x = bpp; x < stride; x++) row[x] += row[x - bpp];
                }
                break;
            default:
                err = "bad filter byte";
                return false;
        }
    }
    img.raw.resize(stride * img.height);
    return true;
}

// Expand the packed scanlines into 3-channel RGB.
static void to_rgb(const PngImage& img, uint8_t* dst) {
    const size_t n = size_t(img.width) * img.height;
    const uint8_t* s = img.raw.data();
    switch (img.color_type) {
        case 0:  // gray
            for (size_t i = 0; i < n; i++) {
                dst[3 * i] = dst[3 * i + 1] = dst[3 * i + 2] = s[i];
            }
            break;
        case 2:  // already RGB
            std::memcpy(dst, s, 3 * n);
            break;
        case 3: {  // palette
            const uint8_t* pal = img.palette.data();
            const size_t pal_n = img.palette.size() / 3;
            for (size_t i = 0; i < n; i++) {
                size_t idx = s[i] < pal_n ? s[i] : 0;
                std::memcpy(dst + 3 * i, pal + 3 * idx, 3);
            }
            break;
        }
        case 4:  // gray + alpha (alpha dropped)
            for (size_t i = 0; i < n; i++) {
                dst[3 * i] = dst[3 * i + 1] = dst[3 * i + 2] = s[2 * i];
            }
            break;
        case 6:  // rgba (alpha dropped)
            for (size_t i = 0; i < n; i++) {
                std::memcpy(dst + 3 * i, s + 4 * i, 3);
            }
            break;
    }
}

static PyObject* py_decode_rgb(PyObject*, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;

    PngImage img;
    std::string err;
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    ok = decode_png(static_cast<const uint8_t*>(buf.buf),
                    static_cast<size_t>(buf.len), img, err);
    Py_END_ALLOW_THREADS
    if (!ok) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, err.c_str());
        return nullptr;
    }
    PyBuffer_Release(&buf);

    const size_t out_n = size_t(img.width) * img.height * 3;
    PyObject* out = PyBytes_FromStringAndSize(nullptr,
                                              static_cast<Py_ssize_t>(out_n));
    if (!out) return nullptr;
    uint8_t* dst = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out));
    Py_BEGIN_ALLOW_THREADS
    to_rgb(img, dst);
    Py_END_ALLOW_THREADS
    return Py_BuildValue("(NII)", out, img.height, img.width);
}

static PyMethodDef kMethods[] = {
    {"decode_rgb", py_decode_rgb, METH_VARARGS,
     "decode_rgb(data) -> (rgb_bytes, height, width); ValueError if "
     "unsupported (caller falls back to PIL)"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "fastpng",
    "C++ PNG -> RGB8 decoder for the serving image-prep hot path", -1,
    kMethods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_fastpng(void) { return PyModule_Create(&kModule); }
