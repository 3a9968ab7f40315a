/* Levenshtein edit distance as a CPython extension.
 *
 * TPU-native replacement for the reference's `editdistance` C++ dependency
 * (reference: speech/utils/score.py:1-18, requirements.txt). Corpus-level
 * CER/WER scoring runs on the host during eval; with thousands of utterances
 * and long label sequences the O(len(a)*len(b)) DP is the hot host loop, so it
 * lives in C. A pure-Python fallback exists in speech_tpu/utils/editdistance.py.
 *
 * Exposed API (mirrors `editdistance.eval`):
 *   _editdistance.eval(a, b) -> int
 * where a and b are unicode strings or sequences of objects convertible to
 * C longs (the framework scores integer token-id sequences).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>
#include <string.h>

static Py_ssize_t levenshtein_u32(const Py_UCS4 *a, Py_ssize_t la,
                                  const Py_UCS4 *b, Py_ssize_t lb) {
    if (la == 0) return lb;
    if (lb == 0) return la;
    /* Keep the shorter sequence as the row for O(min) memory. */
    if (lb > la) {
        const Py_UCS4 *t = a; a = b; b = t;
        Py_ssize_t lt = la; la = lb; lb = lt;
    }
    Py_ssize_t *row = (Py_ssize_t *)malloc((size_t)(lb + 1) * sizeof(Py_ssize_t));
    if (!row) return -1;
    for (Py_ssize_t j = 0; j <= lb; ++j) row[j] = j;
    for (Py_ssize_t i = 1; i <= la; ++i) {
        Py_ssize_t prev_diag = row[0];
        row[0] = i;
        for (Py_ssize_t j = 1; j <= lb; ++j) {
            Py_ssize_t cur = row[j];
            Py_ssize_t sub = prev_diag + (a[i - 1] != b[j - 1]);
            Py_ssize_t del = cur + 1;
            Py_ssize_t ins = row[j - 1] + 1;
            Py_ssize_t best = sub < del ? sub : del;
            row[j] = best < ins ? best : ins;
            prev_diag = cur;
        }
    }
    Py_ssize_t result = row[lb];
    free(row);
    return result;
}

/* Convert a str or sequence of int-likes into a Py_UCS4 buffer of symbols.
 * For int sequences the values are truncated into uint32 symbol space, which
 * is lossless for any realistic vocabulary. Returns 0 on success. */
static int as_symbols(PyObject *obj, Py_UCS4 **out, Py_ssize_t *len) {
    if (PyUnicode_Check(obj)) {
        Py_ssize_t n = PyUnicode_GET_LENGTH(obj);
        Py_UCS4 *buf = (Py_UCS4 *)malloc((size_t)(n > 0 ? n : 1) * sizeof(Py_UCS4));
        if (!buf) { PyErr_NoMemory(); return -1; }
        if (n > 0 && !PyUnicode_AsUCS4(obj, buf, n, 0)) { free(buf); return -1; }
        *out = buf; *len = n;
        return 0;
    }
    PyObject *fast = PySequence_Fast(obj, "eval() arguments must be strings or sequences");
    if (!fast) return -1;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    Py_UCS4 *buf = (Py_UCS4 *)malloc((size_t)(n > 0 ? n : 1) * sizeof(Py_UCS4));
    if (!buf) { Py_DECREF(fast); PyErr_NoMemory(); return -1; }
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *item = PySequence_Fast_GET_ITEM(fast, i);
        long v = PyLong_AsLong(item);
        if (v == -1 && PyErr_Occurred()) {
            /* Non-integer element (e.g. multi-char token strings): signal the
             * caller to use the generic-object Python fallback. */
            free(buf); Py_DECREF(fast);
            return -2;
        }
        buf[i] = (Py_UCS4)(unsigned long)v;
    }
    Py_DECREF(fast);
    *out = buf; *len = n;
    return 0;
}

static PyObject *ed_eval(PyObject *self, PyObject *args) {
    PyObject *a_obj, *b_obj;
    if (!PyArg_ParseTuple(args, "OO", &a_obj, &b_obj)) return NULL;
    Py_UCS4 *a = NULL, *b = NULL;
    Py_ssize_t la = 0, lb = 0;
    int ra = as_symbols(a_obj, &a, &la);
    if (ra == -2) { PyErr_SetString(PyExc_TypeError, "unsupported element type"); return NULL; }
    if (ra != 0) return NULL;
    int rb = as_symbols(b_obj, &b, &lb);
    if (rb != 0) {
        free(a);
        if (rb == -2) PyErr_SetString(PyExc_TypeError, "unsupported element type");
        return NULL;
    }
    Py_ssize_t d;
    Py_BEGIN_ALLOW_THREADS
    d = levenshtein_u32(a, la, b, lb);
    Py_END_ALLOW_THREADS
    free(a); free(b);
    if (d < 0) return PyErr_NoMemory();
    return PyLong_FromSsize_t(d);
}

static PyMethodDef ed_methods[] = {
    {"eval", ed_eval, METH_VARARGS,
     "eval(a, b) -> Levenshtein distance between two strings or int sequences."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef ed_module = {
    PyModuleDef_HEAD_INIT, "_editdistance",
    "Native Levenshtein edit distance.", -1, ed_methods,
};

PyMODINIT_FUNC PyInit__editdistance(void) {
    return PyModule_Create(&ed_module);
}
