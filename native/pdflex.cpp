// pdflex — C++ PDF content-stream lexer.
//
// Anchor-text generation interprets every page's content stream
// (karanta_tpu/pdf/textextract.py); at 100M-page pipeline scale the Python
// tokenizer is the host hot loop. This extension lexes a content stream in
// one pass and returns a flat token list the interpreter consumes.
//
//   lex_content(data: bytes) -> list[tuple]
//     ("num", float)          number
//     ("str", bytes)          literal or hex string
//     ("name", str)           /Name
//     ("op", bytes)           operator / keyword (true/false/null included)
//     ("arr", list)           array of the above (nested)
//
// Dictionaries in content streams (inline-image dicts) are rare; << ... >>
// groups are skipped as in the Python fallback's BI handling.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Lexer {
    const uint8_t* data;
    Py_ssize_t size;
    Py_ssize_t pos = 0;

    bool is_ws(uint8_t c) const {
        return c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32;
    }
    bool is_delim(uint8_t c) const {
        return c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
               c == ']' || c == '{' || c == '}' || c == '/' || c == '%';
    }
    void skip_ws() {
        while (pos < size) {
            uint8_t c = data[pos];
            if (is_ws(c)) {
                pos++;
            } else if (c == '%') {
                while (pos < size && data[pos] != '\n' && data[pos] != '\r')
                    pos++;
            } else {
                return;
            }
        }
    }
};

// forward decl
static PyObject* lex_one(Lexer& lx, int depth);

static PyObject* make_pair(const char* kind, PyObject* value) {
    if (!value) return nullptr;
    PyObject* out = Py_BuildValue("(sN)", kind, value);
    return out;
}

static PyObject* lex_literal_string(Lexer& lx) {
    // data[pos] == '('
    lx.pos++;
    std::string out;
    int depth = 1;
    while (lx.pos < lx.size) {
        uint8_t c = lx.data[lx.pos];
        if (c == '\\') {
            lx.pos++;
            if (lx.pos >= lx.size) break;
            uint8_t e = lx.data[lx.pos];
            switch (e) {
                case 'n': out.push_back('\n'); lx.pos++; break;
                case 'r': out.push_back('\r'); lx.pos++; break;
                case 't': out.push_back('\t'); lx.pos++; break;
                case 'b': out.push_back('\b'); lx.pos++; break;
                case 'f': out.push_back('\f'); lx.pos++; break;
                case '(': out.push_back('('); lx.pos++; break;
                case ')': out.push_back(')'); lx.pos++; break;
                case '\\': out.push_back('\\'); lx.pos++; break;
                case '\r':
                    lx.pos++;
                    if (lx.pos < lx.size && lx.data[lx.pos] == '\n') lx.pos++;
                    break;
                case '\n': lx.pos++; break;
                default:
                    if (e >= '0' && e <= '7') {
                        int val = 0, digits = 0;
                        while (lx.pos < lx.size && digits < 3 &&
                               lx.data[lx.pos] >= '0' && lx.data[lx.pos] <= '7') {
                            val = val * 8 + (lx.data[lx.pos] - '0');
                            lx.pos++;
                            digits++;
                        }
                        out.push_back(static_cast<char>(val & 0xFF));
                    } else {
                        out.push_back(static_cast<char>(e));
                        lx.pos++;
                    }
            }
        } else if (c == '(') {
            depth++;
            out.push_back('(');
            lx.pos++;
        } else if (c == ')') {
            depth--;
            lx.pos++;
            if (depth == 0) break;
            out.push_back(')');
        } else {
            out.push_back(static_cast<char>(c));
            lx.pos++;
        }
    }
    return make_pair("str", PyBytes_FromStringAndSize(out.data(),
                                                      (Py_ssize_t)out.size()));
}

static int hex_val(uint8_t c) {
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    if (c >= 'A' && c <= 'F') return c - 'A' + 10;
    return -1;
}

static PyObject* lex_hex_string(Lexer& lx) {
    // data[pos] == '<'
    lx.pos++;
    std::string out;
    int hi = -1;
    while (lx.pos < lx.size && lx.data[lx.pos] != '>') {
        int v = hex_val(lx.data[lx.pos]);
        lx.pos++;
        if (v < 0) continue;
        if (hi < 0) {
            hi = v;
        } else {
            out.push_back(static_cast<char>((hi << 4) | v));
            hi = -1;
        }
    }
    if (hi >= 0) out.push_back(static_cast<char>(hi << 4));
    if (lx.pos < lx.size) lx.pos++;  // consume '>'
    return make_pair("str", PyBytes_FromStringAndSize(out.data(),
                                                      (Py_ssize_t)out.size()));
}

static PyObject* lex_name(Lexer& lx) {
    // data[pos] == '/'
    lx.pos++;
    std::string out;
    while (lx.pos < lx.size) {
        uint8_t c = lx.data[lx.pos];
        if (lx.is_ws(c) || lx.is_delim(c)) break;
        if (c == '#' && lx.pos + 2 < lx.size) {
            int a = hex_val(lx.data[lx.pos + 1]);
            int b = hex_val(lx.data[lx.pos + 2]);
            if (a >= 0 && b >= 0) {
                out.push_back(static_cast<char>((a << 4) | b));
                lx.pos += 3;
                continue;
            }
        }
        out.push_back(static_cast<char>(c));
        lx.pos++;
    }
    return make_pair("name",
                     PyUnicode_DecodeLatin1(out.data(), (Py_ssize_t)out.size(),
                                            "replace"));
}

static PyObject* lex_array(Lexer& lx, int depth) {
    // data[pos] == '['
    lx.pos++;
    PyObject* items = PyList_New(0);
    if (!items) return nullptr;
    while (true) {
        lx.skip_ws();
        if (lx.pos >= lx.size || lx.data[lx.pos] == ']') {
            if (lx.pos < lx.size) lx.pos++;
            break;
        }
        PyObject* item = lex_one(lx, depth + 1);
        if (!item) {
            Py_DECREF(items);
            return nullptr;
        }
        if (PyList_Append(items, item) < 0) {
            Py_DECREF(item);
            Py_DECREF(items);
            return nullptr;
        }
        Py_DECREF(item);
    }
    return make_pair("arr", items);
}

static bool is_number(const std::string& tok) {
    if (tok.empty()) return false;
    size_t i = (tok[0] == '+' || tok[0] == '-') ? 1 : 0;
    if (i >= tok.size()) return false;
    bool digit = false;
    bool dot = false;
    for (; i < tok.size(); i++) {
        if (tok[i] >= '0' && tok[i] <= '9') {
            digit = true;
        } else if (tok[i] == '.' && !dot) {
            dot = true;
        } else {
            return false;
        }
    }
    return digit || dot;
}

static PyObject* lex_one(Lexer& lx, int depth) {
    if (depth > 32) {
        PyErr_SetString(PyExc_ValueError, "content stream nests too deep");
        return nullptr;
    }
    lx.skip_ws();
    if (lx.pos >= lx.size) Py_RETURN_NONE;
    uint8_t c = lx.data[lx.pos];
    if (c == '(') return lex_literal_string(lx);
    if (c == '<') {
        if (lx.pos + 1 < lx.size && lx.data[lx.pos + 1] == '<') {
            // inline dict: skip to matching >> (rare in content streams)
            lx.pos += 2;
            int d = 1;
            while (lx.pos + 1 < lx.size && d > 0) {
                if (lx.data[lx.pos] == '<' && lx.data[lx.pos + 1] == '<') {
                    d++;
                    lx.pos += 2;
                } else if (lx.data[lx.pos] == '>' && lx.data[lx.pos + 1] == '>') {
                    d--;
                    lx.pos += 2;
                } else {
                    lx.pos++;
                }
            }
            return make_pair("op", PyBytes_FromString("<<dict>>"));
        }
        return lex_hex_string(lx);
    }
    if (c == '/') return lex_name(lx);
    if (c == '[') return lex_array(lx, depth);
    if (c == ']' || c == ')' || c == '>' || c == '{' || c == '}') {
        lx.pos++;  // stray delimiter: emit as operator so callers can skip
        char buf[2] = {static_cast<char>(c), 0};
        return make_pair("op", PyBytes_FromString(buf));
    }
    // bare token
    std::string tok;
    while (lx.pos < lx.size) {
        uint8_t t = lx.data[lx.pos];
        if (lx.is_ws(t) || lx.is_delim(t)) break;
        tok.push_back(static_cast<char>(t));
        lx.pos++;
    }
    if (tok.empty()) {
        lx.pos++;
        Py_RETURN_NONE;
    }
    if (is_number(tok)) {
        return make_pair("num", PyFloat_FromDouble(strtod(tok.c_str(), nullptr)));
    }
    return make_pair("op", PyBytes_FromStringAndSize(tok.data(),
                                                     (Py_ssize_t)tok.size()));
}

static PyObject* py_lex_content(PyObject*, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    Lexer lx{static_cast<const uint8_t*>(buf.buf), buf.len};
    PyObject* out = PyList_New(0);
    if (!out) {
        PyBuffer_Release(&buf);
        return nullptr;
    }
    while (true) {
        lx.skip_ws();
        if (lx.pos >= lx.size) break;
        PyObject* item = lex_one(lx, 0);
        if (!item) {
            Py_DECREF(out);
            PyBuffer_Release(&buf);
            return nullptr;
        }
        if (item == Py_None) {
            Py_DECREF(item);
            continue;
        }
        if (PyList_Append(out, item) < 0) {
            Py_DECREF(item);
            Py_DECREF(out);
            PyBuffer_Release(&buf);
            return nullptr;
        }
        Py_DECREF(item);
    }
    PyBuffer_Release(&buf);
    return out;
}

static PyMethodDef kMethods[] = {
    {"lex_content", py_lex_content, METH_VARARGS,
     "lex_content(data: bytes) -> list of (kind, value) tokens"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "pdflex",
    "C++ PDF content-stream lexer", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_pdflex(void) { return PyModule_Create(&kModule); }
