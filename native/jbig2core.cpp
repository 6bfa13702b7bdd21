// jbig2core — native JBIG2 generic-region decoder (ITU-T T.88).
//
// Behavioral twin of the pure-Python reference in
// karanta_tpu/pdf/jbig2.py (MQ arithmetic decoder, Annex E; generic
// region templates 0-3 with AT pixels and TPGDON, 6.2). The per-pixel MQ
// loop is sequential and adaptive — unvectorizable in numpy and ~10^6-10^7
// Python-level operations per scanned page — so the production path runs
// here; tests pin bit-equality of the two implementations on every
// template (tests/test_jbig2.py).
//
// Exposed functions:
//   decode_generic(data: bytes, width: int, height: int, template: int,
//                  at: bytes /* signed dx,dy pairs */, tpgdon: int)
//       -> bytes  (width*height bitmap, 1 byte per pixel, 1 = black)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct QeRow {
    uint16_t qe;
    uint8_t nmps, nlps, sw;
};

// T.88 Table E.1
static const QeRow kQe[47] = {
    {0x5601, 1, 1, 1},   {0x3401, 2, 6, 0},   {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0},  {0x0521, 5, 29, 0},  {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},   {0x5401, 8, 14, 0},  {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0}, {0x3001, 11, 17, 0}, {0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0}, {0x1601, 29, 21, 0}, {0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0}, {0x5101, 17, 15, 0}, {0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0}, {0x3401, 20, 18, 0}, {0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0}, {0x2401, 23, 20, 0}, {0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0}, {0x1801, 26, 23, 0}, {0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0}, {0x1201, 29, 26, 0}, {0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0}, {0x09C1, 32, 29, 0}, {0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0}, {0x0441, 35, 32, 0}, {0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0}, {0x0141, 38, 35, 0}, {0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0}, {0x0049, 41, 38, 0}, {0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0}, {0x0009, 44, 41, 0}, {0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0}, {0x5601, 46, 46, 0},
};

class MQDecoder {
  public:
    MQDecoder(const uint8_t* data, size_t n) : data_(data), n_(n), bp_(0) {
        c_ = static_cast<uint32_t>(b(0)) << 16;
        bytein();
        c_ <<= 7;
        ct_ -= 7;
        a_ = 0x8000;
    }

    int decode(uint8_t* icx, uint8_t* mps, uint32_t i) {
        const QeRow& row = kQe[icx[i]];
        const uint32_t qe = row.qe;
        int d;
        a_ -= qe;
        if (((c_ >> 16) & 0xFFFF) < qe) {
            if (a_ < qe) {
                d = mps[i];
                icx[i] = row.nmps;
            } else {
                d = 1 - mps[i];
                if (row.sw) mps[i] ^= 1;
                icx[i] = row.nlps;
            }
            a_ = qe;
        } else {
            c_ -= qe << 16;
            if (a_ & 0x8000) return mps[i];
            if (a_ < qe) {
                d = 1 - mps[i];
                if (row.sw) mps[i] ^= 1;
                icx[i] = row.nlps;
            } else {
                d = mps[i];
                icx[i] = row.nmps;
            }
        }
        do {
            if (ct_ == 0) bytein();
            a_ <<= 1;
            c_ <<= 1;
            ct_--;
        } while (!(a_ & 0x8000));
        a_ &= 0xFFFF;
        return d;
    }

  private:
    uint8_t b(size_t i) const { return i < n_ ? data_[i] : 0xFF; }

    void bytein() {
        if (b(bp_) == 0xFF) {
            if (b(bp_ + 1) > 0x8F) {
                c_ += 0xFF00;
                ct_ = 8;
            } else {
                bp_++;
                c_ += static_cast<uint32_t>(b(bp_)) << 9;
                ct_ = 7;
            }
        } else {
            bp_++;
            c_ += static_cast<uint32_t>(b(bp_)) << 8;
            ct_ = 8;
        }
    }

    const uint8_t* data_;
    size_t n_;
    size_t bp_;
    uint32_t c_;
    uint32_t a_;
    int ct_ = 0;
};

// SLTP decision contexts per template (T.88 6.2.5.7)
static const uint32_t kTpgdonCtx[4] = {0x9B25, 0x0795, 0x00E5, 0x0195};

struct Offset {
    int dx, dy;
};

// context bit layouts, LSB first — must match jbig2.py _template_offsets
static int template_offsets(int tmpl, const int8_t* at, Offset* out) {
    int n = 0;
    auto add = [&](int dx, int dy) { out[n++] = {dx, dy}; };
    switch (tmpl) {
        case 0:
            add(-1, 0); add(-2, 0); add(-3, 0); add(-4, 0);
            add(at[0], at[1]);
            add(2, -1); add(1, -1); add(0, -1); add(-1, -1); add(-2, -1);
            add(at[2], at[3]); add(at[4], at[5]);
            add(1, -2); add(0, -2); add(-1, -2);
            add(at[6], at[7]);
            break;
        case 1:
            add(-1, 0); add(-2, 0); add(-3, 0);
            add(at[0], at[1]);
            add(2, -1); add(1, -1); add(0, -1); add(-1, -1); add(-2, -1);
            add(2, -2); add(1, -2); add(0, -2); add(-1, -2);
            break;
        case 2:
            add(-1, 0); add(-2, 0);
            add(at[0], at[1]);
            add(1, -1); add(0, -1); add(-1, -1); add(-2, -1);
            add(1, -2); add(0, -2); add(-1, -2);
            break;
        case 3:
            add(-1, 0); add(-2, 0); add(-3, 0); add(-4, 0);
            add(at[0], at[1]);
            add(1, -1); add(0, -1); add(-1, -1); add(-2, -1); add(-3, -1);
            break;
        default:
            return -1;
    }
    return n;
}

static PyObject* decode_generic(PyObject*, PyObject* args) {
    Py_buffer data, at;
    int width, height, tmpl, tpgdon;
    if (!PyArg_ParseTuple(args, "y*iiiy*i", &data, &width, &height, &tmpl,
                          &at, &tpgdon)) {
        return nullptr;
    }
    if (width <= 0 || height <= 0 || tmpl < 0 || tmpl > 3 ||
        (tmpl == 0 && at.len < 8) || (tmpl != 0 && at.len < 2)) {
        PyBuffer_Release(&data);
        PyBuffer_Release(&at);
        PyErr_SetString(PyExc_ValueError, "bad generic-region parameters");
        return nullptr;
    }

    Offset offs[16];
    int n_off = template_offsets(
        tmpl, static_cast<const int8_t*>(at.buf), offs);

    std::vector<uint8_t> bitmap(
        static_cast<size_t>(width) * static_cast<size_t>(height), 0);
    std::vector<uint8_t> icx(1u << 16, 0), mps(1u << 16, 0);
    MQDecoder mq(static_cast<const uint8_t*>(data.buf),
                 static_cast<size_t>(data.len));

    auto px = [&](int x, int y) -> uint32_t {
        if (x < 0 || y < 0 || x >= width || y >= height) return 0;
        return bitmap[static_cast<size_t>(y) * width + x];
    };

    int ltp = 0;
    Py_BEGIN_ALLOW_THREADS
    for (int y = 0; y < height; y++) {
        if (tpgdon) {
            if (mq.decode(icx.data(), mps.data(), kTpgdonCtx[tmpl])) {
                ltp ^= 1;
            }
            if (ltp) {
                if (y > 0) {
                    std::memcpy(&bitmap[static_cast<size_t>(y) * width],
                                &bitmap[static_cast<size_t>(y - 1) * width],
                                static_cast<size_t>(width));
                }
                continue;
            }
        }
        uint8_t* row = &bitmap[static_cast<size_t>(y) * width];
        for (int x = 0; x < width; x++) {
            uint32_t context = 0;
            for (int k = 0; k < n_off; k++) {
                context |= px(x + offs[k].dx, y + offs[k].dy) << k;
            }
            row[x] = static_cast<uint8_t>(
                mq.decode(icx.data(), mps.data(), context));
        }
    }
    Py_END_ALLOW_THREADS

    PyObject* out = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(bitmap.data()),
        static_cast<Py_ssize_t>(bitmap.size()));
    PyBuffer_Release(&data);
    PyBuffer_Release(&at);
    return out;
}

static PyMethodDef kMethods[] = {
    {"decode_generic", decode_generic, METH_VARARGS,
     "decode_generic(data, width, height, template, at, tpgdon) -> bytes"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "jbig2core",
    "native JBIG2 generic-region decoder (T.88)", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_jbig2core() { return PyModule_Create(&kModule); }
