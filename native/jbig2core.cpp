// jbig2core — native JBIG2 decoder (ITU-T T.88), arithmetic paths.
//
// Behavioral twin of the pure-Python reference in karanta_tpu/pdf/jbig2.py
// + jbig2_text.py: MQ arithmetic decoder (Annex E), generic regions
// (templates 0-3, AT pixels, TPGDON, 6.2), integer arithmetic decoding
// (Annex A) + IAID trees, generic refinement (6.3, templates 0/1 with
// TPGRON), symbol dictionaries (6.5) and text regions (6.4). Per-pixel MQ
// loops are sequential and adaptive — unvectorizable in numpy and
// 10^5-10^7 Python-level ops per scanned page — so production decoding
// runs here; tests pin bit-equality against the Python reference
// (tests/test_jbig2.py, test_jbig2_text.py).
//
// Exposed functions:
//   decode_generic(data, width, height, template, at, tpgdon) -> bytes
//   decode_symbol_dict(payload, inherited: list[(w, h, bytes)])
//       -> list[(w, h, bytes)]
//   decode_text_region(payload, symbols: list[(w, h, bytes)])
//       -> (w, h, x, y, comb_op, bytes)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
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

struct JBIG2Err : std::runtime_error {
    explicit JBIG2Err(const std::string& m) : std::runtime_error(m) {}
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

struct Bitmap {
    int w = 0, h = 0;
    std::vector<uint8_t> px;

    Bitmap() = default;
    Bitmap(int w_, int h_) : w(w_), h(h_) {
        if (w_ <= 0 || h_ <= 0 || static_cast<int64_t>(w_) * h_ > (1 << 28))
            throw JBIG2Err("bad bitmap dimensions");
        px.assign(static_cast<size_t>(w_) * h_, 0);
    }
    uint32_t get(int x, int y) const {
        if (x < 0 || y < 0 || x >= w || y >= h) return 0;
        return px[static_cast<size_t>(y) * w + x];
    }
    void set(int x, int y, uint8_t v) {
        px[static_cast<size_t>(y) * w + x] = v;
    }
};

struct Ctx {
    std::vector<uint8_t> icx, mps;
    explicit Ctx(size_t n) : icx(n, 0), mps(n, 0) {}
};

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
            throw JBIG2Err("bad GBTEMPLATE");
    }
    return n;
}

// SLTP decision contexts per template (T.88 6.2.5.7)
static const uint32_t kTpgdonCtx[4] = {0x9B25, 0x0795, 0x00E5, 0x0195};

static void generic_region_into(MQDecoder& mq, Ctx& cx, Bitmap& bm,
                                int tmpl, const int8_t* at, bool tpgdon) {
    Offset offs[16];
    int n_off = template_offsets(tmpl, at, offs);
    int ltp = 0;
    for (int y = 0; y < bm.h; y++) {
        if (tpgdon) {
            if (mq.decode(cx.icx.data(), cx.mps.data(), kTpgdonCtx[tmpl]))
                ltp ^= 1;
            if (ltp) {
                if (y > 0)
                    std::memcpy(&bm.px[static_cast<size_t>(y) * bm.w],
                                &bm.px[static_cast<size_t>(y - 1) * bm.w],
                                static_cast<size_t>(bm.w));
                continue;
            }
        }
        for (int x = 0; x < bm.w; x++) {
            uint32_t context = 0;
            for (int k = 0; k < n_off; k++)
                context |= bm.get(x + offs[k].dx, y + offs[k].dy) << k;
            bm.set(x, y, static_cast<uint8_t>(
                mq.decode(cx.icx.data(), cx.mps.data(), context)));
        }
    }
}

// ------------------------------------------------------------------
// Annex A: integer arithmetic decoding; A.3: IAID
// ------------------------------------------------------------------

static const int64_t kIntOff[6] = {0, 4, 20, 84, 340, 4436};
static const int kIntBits[6] = {2, 4, 6, 8, 12, 32};

struct IntResult {
    bool oob;
    int64_t value;
};

static IntResult decode_int(MQDecoder& mq, Ctx& cx) {
    uint32_t prev = 1;
    auto bit = [&]() -> int {
        int d = mq.decode(cx.icx.data(), cx.mps.data(), prev);
        prev = prev < 256
                   ? ((prev << 1) | d)
                   : (((((prev << 1) | d)) & 511) | 256);
        return d;
    };
    int s = bit();
    int64_t v = 0;
    for (int i = 0; i < 6; i++) {
        if (i < 5 && bit()) continue;
        v = 0;
        for (int k = 0; k < kIntBits[i]; k++) v = (v << 1) | bit();
        v += kIntOff[i];
        break;
    }
    if (s) {
        if (v == 0) return {true, 0};
        return {false, -v};
    }
    return {false, v};
}

static int64_t need_int(MQDecoder& mq, Ctx& cx, const char* what) {
    IntResult r = decode_int(mq, cx);
    if (r.oob) throw JBIG2Err(std::string("unexpected OOB for ") + what);
    return r.value;
}

static int symcodelen(size_t n_syms) {
    int n = 1;
    while (n_syms > (1u << n)) n++;
    return n;
}

static int decode_iaid(MQDecoder& mq, Ctx& cx, int codelen) {
    uint32_t prev = 1;
    for (int k = 0; k < codelen; k++)
        prev = (prev << 1) | mq.decode(cx.icx.data(), cx.mps.data(), prev);
    return static_cast<int>(prev) - (1 << codelen);
}

// ------------------------------------------------------------------
// 6.3: generic refinement region decoding (templates 0/1 + TPGRON)
// ------------------------------------------------------------------

static const uint32_t kTpgronCtx[2] = {0x0100, 0x0080};

static uint32_t ref_context(const Bitmap& dest, const Bitmap& ref, int x,
                            int y, int dx, int dy, int tmpl,
                            const int8_t* at) {
    auto d = [&](int ax, int ay) { return dest.get(ax, ay); };
    auto r = [&](int ax, int ay) { return ref.get(ax - dx, ay - dy); };
    if (tmpl == 0) {
        return d(x - 1, y)
               | d(x + 1, y - 1) << 1
               | d(x, y - 1) << 2
               | d(x + at[0], y + at[1]) << 3
               | r(x + 1, y + 1) << 4
               | r(x, y + 1) << 5
               | r(x - 1, y + 1) << 6
               | r(x + at[2], y + at[3]) << 7
               | r(x + 1, y) << 8
               | r(x, y) << 9
               | r(x - 1, y) << 10
               | r(x + 1, y - 1) << 11
               | r(x, y - 1) << 12;
    }
    return d(x - 1, y)
           | d(x + 1, y - 1) << 1
           | d(x, y - 1) << 2
           | d(x - 1, y - 1) << 3
           | r(x + 1, y + 1) << 4
           | r(x, y + 1) << 5
           | r(x + 1, y) << 6
           | r(x, y) << 7
           | r(x - 1, y) << 8
           | r(x, y - 1) << 9;
}

// 3x3 reference window uniformity: 0, 1, or -1 (mixed)
static int ref_typical(const Bitmap& ref, int x, int y, int dx, int dy) {
    int sum = 0;
    for (int yy = -1; yy <= 1; yy++)
        for (int xx = -1; xx <= 1; xx++)
            sum += ref.get(x - dx + xx, y - dy + yy);
    if (sum == 0) return 0;
    if (sum == 9) return 1;
    return -1;
}

static Bitmap decode_refinement(MQDecoder& mq, Ctx& cx, int width,
                                int height, const Bitmap& ref, int dx,
                                int dy, int tmpl, const int8_t* at,
                                bool tpgron = false) {
    Bitmap dest(width, height);
    int ltp = 0;
    for (int y = 0; y < height; y++) {
        if (tpgron)
            ltp ^= mq.decode(cx.icx.data(), cx.mps.data(),
                             kTpgronCtx[tmpl]);
        for (int x = 0; x < width; x++) {
            if (ltp) {
                int typ = ref_typical(ref, x, y, dx, dy);
                if (typ >= 0) {
                    dest.set(x, y, static_cast<uint8_t>(typ));
                    continue;
                }
            }
            uint32_t context =
                ref_context(dest, ref, x, y, dx, dy, tmpl, at);
            dest.set(x, y, static_cast<uint8_t>(
                mq.decode(cx.icx.data(), cx.mps.data(), context)));
        }
    }
    return dest;
}

// ------------------------------------------------------------------
// byte readers
// ------------------------------------------------------------------

struct Reader {
    const uint8_t* p;
    size_t n, pos = 0;

    Reader(const uint8_t* p_, size_t n_) : p(p_), n(n_) {}
    uint8_t u8() {
        if (pos + 1 > n) throw JBIG2Err("truncated segment payload");
        return p[pos++];
    }
    int8_t s8() { return static_cast<int8_t>(u8()); }
    uint16_t u16() {
        uint16_t hi = u8();
        return static_cast<uint16_t>((hi << 8) | u8());
    }
    uint32_t u32() {
        uint32_t v = 0;
        for (int i = 0; i < 4; i++) v = (v << 8) | u8();
        return v;
    }
};

// ------------------------------------------------------------------
// Python <-> Bitmap helpers
// ------------------------------------------------------------------

static Bitmap bitmap_from_tuple(PyObject* t) {
    // (w, h, bytes)
    if (!PyTuple_Check(t) || PyTuple_GET_SIZE(t) != 3)
        throw JBIG2Err("symbol must be a (w, h, bytes) tuple");
    long w = PyLong_AsLong(PyTuple_GET_ITEM(t, 0));
    long h = PyLong_AsLong(PyTuple_GET_ITEM(t, 1));
    PyObject* b = PyTuple_GET_ITEM(t, 2);
    if (PyErr_Occurred() || !PyBytes_Check(b))
        throw JBIG2Err("symbol must be a (w, h, bytes) tuple");
    if (PyBytes_GET_SIZE(b) != static_cast<Py_ssize_t>(w) * h)
        throw JBIG2Err("symbol byte length != w*h");
    Bitmap bm(static_cast<int>(w), static_cast<int>(h));
    std::memcpy(bm.px.data(), PyBytes_AS_STRING(b), bm.px.size());
    return bm;
}

static PyObject* bitmap_to_tuple(const Bitmap& bm) {
    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(bm.px.data()),
        static_cast<Py_ssize_t>(bm.px.size()));
    if (!bytes) return nullptr;
    PyObject* t = Py_BuildValue("(iiN)", bm.w, bm.h, bytes);
    return t;
}

// ------------------------------------------------------------------
// exposed: decode_generic
// ------------------------------------------------------------------

static PyObject* decode_generic(PyObject*, PyObject* args) {
    Py_buffer data, at;
    int width, height, tmpl, tpgdon;
    if (!PyArg_ParseTuple(args, "y*iiiy*i", &data, &width, &height, &tmpl,
                          &at, &tpgdon)) {
        return nullptr;
    }
    PyObject* out = nullptr;
    try {
        if (width <= 0 || height <= 0 || tmpl < 0 || tmpl > 3 ||
            (tmpl == 0 && at.len < 8) || (tmpl != 0 && at.len < 2))
            throw JBIG2Err("bad generic-region parameters");
        Bitmap bm(width, height);
        Ctx cx(1u << 16);
        MQDecoder mq(static_cast<const uint8_t*>(data.buf),
                     static_cast<size_t>(data.len));
        const int8_t* atp = static_cast<const int8_t*>(at.buf);
        Py_BEGIN_ALLOW_THREADS
        generic_region_into(mq, cx, bm, tmpl, atp, tpgdon != 0);
        Py_END_ALLOW_THREADS
        out = PyBytes_FromStringAndSize(
            reinterpret_cast<const char*>(bm.px.data()),
            static_cast<Py_ssize_t>(bm.px.size()));
    } catch (const std::exception& e) {
        PyErr_SetString(PyExc_ValueError, e.what());
    }
    PyBuffer_Release(&data);
    PyBuffer_Release(&at);
    return out;
}

// ------------------------------------------------------------------
// exposed: decode_symbol_dict (6.5, arithmetic; mirrors jbig2_text.py)
// ------------------------------------------------------------------

static PyObject* decode_symbol_dict(PyObject*, PyObject* args) {
    Py_buffer payload;
    PyObject* inherited_list;
    if (!PyArg_ParseTuple(args, "y*O", &payload, &inherited_list))
        return nullptr;
    PyObject* result = nullptr;
    try {
        if (!PyList_Check(inherited_list))
            throw JBIG2Err("inherited must be a list");
        std::vector<Bitmap> inherited;
        for (Py_ssize_t i = 0; i < PyList_GET_SIZE(inherited_list); i++)
            inherited.push_back(
                bitmap_from_tuple(PyList_GET_ITEM(inherited_list, i)));

        Reader rd(static_cast<const uint8_t*>(payload.buf),
                  static_cast<size_t>(payload.len));
        uint16_t flags = rd.u16();
        bool sdhuff = flags & 1;
        bool sdrefagg = (flags >> 1) & 1;
        int tmpl = (flags >> 10) & 3;
        int rtemplate = (flags >> 12) & 1;
        if (sdhuff) throw JBIG2Err("Huffman symbol dictionaries unsupported");
        int8_t at[8] = {0};
        int n_at = tmpl == 0 ? 4 : 1;
        for (int i = 0; i < n_at; i++) {
            at[2 * i] = rd.s8();
            at[2 * i + 1] = rd.s8();
        }
        int8_t rat[4] = {-1, -1, -1, -1};
        if (sdrefagg && rtemplate == 0)
            for (int i = 0; i < 4; i++) rat[i] = rd.s8();
        uint32_t n_ex = rd.u32();
        uint32_t n_new = rd.u32();
        if (n_new > (1u << 20) || n_ex > (1u << 20))
            throw JBIG2Err("unreasonable symbol counts");

        MQDecoder mq(rd.p + rd.pos, rd.n - rd.pos);
        Ctx iadh(512), iadw(512), iaex(512), iaai(512), iardx(512),
            iardy(512);
        Ctx gb_cx(1u << 16), gr_cx(1u << 13);
        Ctx id_cx(1u << (symcodelen(inherited.size() + n_new) + 1));
        int id_len = symcodelen(inherited.size() + n_new);

        std::vector<Bitmap> new_syms;
        int64_t height = 0;
        while (new_syms.size() < n_new) {
            IntResult dh = decode_int(mq, iadh);
            if (dh.oob) throw JBIG2Err("OOB height delta");
            height += dh.value;
            int64_t width = 0;
            while (true) {
                IntResult dw = decode_int(mq, iadw);
                if (dw.oob) break;
                width += dw.value;
                if (width <= 0 || height <= 0)
                    throw JBIG2Err("bad symbol dimensions");
                if (new_syms.size() >= n_new)
                    throw JBIG2Err("more symbols than declared");
                if (!sdrefagg) {
                    Bitmap bm(static_cast<int>(width),
                              static_cast<int>(height));
                    generic_region_into(mq, gb_cx, bm, tmpl, at, false);
                    new_syms.push_back(std::move(bm));
                } else {
                    int64_t n_inst = need_int(mq, iaai, "REFAGGNINST");
                    if (n_inst != 1)
                        throw JBIG2Err(
                            "aggregate refinement (REFAGGNINST > 1) "
                            "unsupported");
                    int sym_id = decode_iaid(mq, id_cx, id_len);
                    int64_t rdx = need_int(mq, iardx, "RDX");
                    int64_t rdy = need_int(mq, iardy, "RDY");
                    size_t pool = inherited.size() + new_syms.size();
                    if (sym_id < 0 || static_cast<size_t>(sym_id) >= pool)
                        throw JBIG2Err(
                            "refinement references unknown symbol");
                    const Bitmap& ref =
                        static_cast<size_t>(sym_id) < inherited.size()
                            ? inherited[sym_id]
                            : new_syms[sym_id - inherited.size()];
                    new_syms.push_back(decode_refinement(
                        mq, gr_cx, static_cast<int>(width),
                        static_cast<int>(height), ref,
                        static_cast<int>(rdx), static_cast<int>(rdy),
                        rtemplate, rat));
                }
            }
        }

        // 6.5.10: export runs over inherited + new
        std::vector<const Bitmap*> all;
        for (const Bitmap& b : inherited) all.push_back(&b);
        for (const Bitmap& b : new_syms) all.push_back(&b);
        std::vector<const Bitmap*> exported;
        size_t i = 0;
        int flag = 0;
        while (i < all.size() && exported.size() < n_ex) {
            IntResult run = decode_int(mq, iaex);
            if (run.oob || run.value < 0) throw JBIG2Err("bad export run");
            if (flag)
                for (int64_t k = 0; k < run.value && i + k < all.size();
                     k++)
                    exported.push_back(all[i + k]);
            i += static_cast<size_t>(run.value);
            flag ^= 1;
        }
        if (exported.size() != n_ex)
            throw JBIG2Err("export count mismatch");

        result = PyList_New(static_cast<Py_ssize_t>(exported.size()));
        if (!result) throw JBIG2Err("alloc failed");
        for (size_t k = 0; k < exported.size(); k++) {
            PyObject* t = bitmap_to_tuple(*exported[k]);
            if (!t) {
                Py_DECREF(result);
                result = nullptr;
                throw JBIG2Err("alloc failed");
            }
            PyList_SET_ITEM(result, static_cast<Py_ssize_t>(k), t);
        }
    } catch (const std::exception& e) {
        if (!PyErr_Occurred()) PyErr_SetString(PyExc_ValueError, e.what());
        Py_XDECREF(result);
        result = nullptr;
    }
    PyBuffer_Release(&payload);
    return result;
}

// ------------------------------------------------------------------
// exposed: decode_text_region (6.4, arithmetic; mirrors jbig2_text.py)
// ------------------------------------------------------------------

static void draw(Bitmap& region, const Bitmap& bmp, int x, int y, int op) {
    int x0 = x > 0 ? x : 0, y0 = y > 0 ? y : 0;
    int x1 = x + bmp.w < region.w ? x + bmp.w : region.w;
    int y1 = y + bmp.h < region.h ? y + bmp.h : region.h;
    for (int yy = y0; yy < y1; yy++) {
        for (int xx = x0; xx < x1; xx++) {
            uint8_t s = bmp.px[static_cast<size_t>(yy - y) * bmp.w
                               + (xx - x)];
            uint8_t* d =
                &region.px[static_cast<size_t>(yy) * region.w + xx];
            switch (op) {
                case 0: *d |= s; break;
                case 1: *d &= s; break;
                case 2: *d ^= s; break;
                default: *d = static_cast<uint8_t>(1 - (*d ^ s)); break;
            }
        }
    }
}

static PyObject* decode_text_region(PyObject*, PyObject* args) {
    Py_buffer payload;
    PyObject* symbols_list;
    if (!PyArg_ParseTuple(args, "y*O", &payload, &symbols_list))
        return nullptr;
    PyObject* result = nullptr;
    try {
        if (!PyList_Check(symbols_list) || PyList_GET_SIZE(symbols_list) == 0)
            throw JBIG2Err("text region with no symbol dictionary");
        std::vector<Bitmap> symbols;
        for (Py_ssize_t i = 0; i < PyList_GET_SIZE(symbols_list); i++)
            symbols.push_back(
                bitmap_from_tuple(PyList_GET_ITEM(symbols_list, i)));

        Reader rd(static_cast<const uint8_t*>(payload.buf),
                  static_cast<size_t>(payload.len));
        uint32_t rw = rd.u32(), rh = rd.u32(), rx = rd.u32(), ry = rd.u32();
        int ext_comb = rd.u8() & 7;
        uint16_t flags = rd.u16();
        if (flags & 1) throw JBIG2Err("Huffman text regions unsupported");
        int refine = (flags >> 1) & 1;
        int log_strips = (flags >> 2) & 3;
        int ref_corner = (flags >> 4) & 3;
        int transposed = (flags >> 6) & 1;
        int comb_op = (flags >> 7) & 3;
        int def_pixel = (flags >> 9) & 1;
        int ds_offset = (flags >> 10) & 0x1F;
        if (ds_offset > 15) ds_offset -= 32;
        int rtemplate = (flags >> 15) & 1;
        int8_t rat[4] = {-1, -1, -1, -1};
        if (refine && rtemplate == 0)
            for (int i = 0; i < 4; i++) rat[i] = rd.s8();
        uint32_t n_instances = rd.u32();
        if (rw > (1u << 20) || rh > (1u << 20) || n_instances > (1u << 24))
            throw JBIG2Err("unreasonable text-region parameters");
        int strips = 1 << log_strips;

        MQDecoder mq(rd.p + rd.pos, rd.n - rd.pos);
        Ctx iadt(512), iafs(512), iads(512), iait(512), iari(512),
            iardw(512), iardh(512), iardx(512), iardy(512);
        int id_len = symcodelen(symbols.size());
        Ctx id_cx(1u << (id_len + 1));
        Ctx gr_cx(1u << 13);

        Bitmap region(static_cast<int>(rw), static_cast<int>(rh));
        if (def_pixel)
            std::fill(region.px.begin(), region.px.end(), 1);
        int64_t stript = -need_int(mq, iadt, "STRIPT") * strips;
        int64_t firsts = 0;
        uint32_t n_decoded = 0;
        while (n_decoded < n_instances) {
            stript += need_int(mq, iadt, "strip delta") * strips;
            bool first = true;
            int64_t curs = 0;
            while (true) {
                if (first) {
                    firsts += need_int(mq, iafs, "first S");
                    curs = firsts;
                    first = false;
                } else {
                    IntResult ids = decode_int(mq, iads);
                    if (ids.oob) break;  // end of strip
                    curs += ids.value + ds_offset;
                }
                int64_t curt =
                    strips == 1 ? 0 : need_int(mq, iait, "CURT");
                int64_t t = stript + curt;
                int sym_id = decode_iaid(mq, id_cx, id_len);
                if (sym_id < 0
                    || static_cast<size_t>(sym_id) >= symbols.size())
                    throw JBIG2Err("symbol id out of range");
                const Bitmap* bmp = &symbols[sym_id];
                Bitmap refined;
                if (refine) {
                    int64_t r = need_int(mq, iari, "RI");
                    if (r) {
                        int64_t rdw = need_int(mq, iardw, "RDW");
                        int64_t rdh = need_int(mq, iardh, "RDH");
                        int64_t rdx = need_int(mq, iardx, "RDX");
                        int64_t rdy = need_int(mq, iardy, "RDY");
                        int64_t nw = bmp->w + rdw, nh = bmp->h + rdh;
                        if (nw <= 0 || nh <= 0)
                            throw JBIG2Err("bad refined dimensions");
                        refined = decode_refinement(
                            mq, gr_cx, static_cast<int>(nw),
                            static_cast<int>(nh), *bmp,
                            static_cast<int>((rdw >> 1) + rdx),
                            static_cast<int>((rdh >> 1) + rdy), rtemplate,
                            rat);
                        bmp = &refined;
                    }
                }
                int bh = bmp->h, bw = bmp->w;
                if (!transposed) {
                    int x = static_cast<int>(curs);
                    int y = static_cast<int>(
                        (ref_corner == 1 || ref_corner == 3)
                            ? t
                            : t - bh + 1);
                    draw(region, *bmp, x, y, comb_op);
                    curs += bw - 1;
                } else {
                    int x = static_cast<int>(
                        (ref_corner == 0 || ref_corner == 1)
                            ? t
                            : t - bw + 1);
                    int y = static_cast<int>(curs);
                    draw(region, *bmp, x, y, comb_op);
                    curs += bh - 1;
                }
                n_decoded++;
                if (n_decoded > n_instances)
                    throw JBIG2Err("instance overrun");
            }
        }
        PyObject* bytes = PyBytes_FromStringAndSize(
            reinterpret_cast<const char*>(region.px.data()),
            static_cast<Py_ssize_t>(region.px.size()));
        if (!bytes) throw JBIG2Err("alloc failed");
        result = Py_BuildValue("(IIIIiN)", rw, rh, rx, ry, ext_comb, bytes);
    } catch (const std::exception& e) {
        if (!PyErr_Occurred()) PyErr_SetString(PyExc_ValueError, e.what());
        Py_XDECREF(result);
        result = nullptr;
    }
    PyBuffer_Release(&payload);
    return result;
}

static PyMethodDef kMethods[] = {
    {"decode_generic", decode_generic, METH_VARARGS,
     "decode_generic(data, width, height, template, at, tpgdon) -> bytes"},
    {"decode_symbol_dict", decode_symbol_dict, METH_VARARGS,
     "decode_symbol_dict(payload, inherited) -> list[(w, h, bytes)]"},
    {"decode_text_region", decode_text_region, METH_VARARGS,
     "decode_text_region(payload, symbols) -> (w, h, x, y, comb_op, "
     "bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "jbig2core",
    "native JBIG2 decoder (T.88): generic, symbol-dict, text regions", -1,
    kMethods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_jbig2core() { return PyModule_Create(&kModule); }
