"""Minimal Lua interpreter for drop-in filter modules.

The reference's user-extension surface is a Lua lifecycle table
``{create, destroy, filter, cleanup}`` loaded from ``.lua`` files
(reference docs/lua-filters-api.md:19-80, src/core/filters_lua.c:224-289,
svc-src/nxsearch_svc.lua:24-34).  This sandbox has no Lua runtime and no
``lupa`` binding, so actual ``.lua`` acceptance needs an interpreter.

This module implements the practical Lua 5.x subset those filter
modules use: local/global variables, functions and closures, tables,
multiple return values, control flow (if/while/repeat/for), the
operators, method-call sugar (``s:lower()``), and the stdlib corners
filters touch — ``string.*``, ``table.*``, ``math.*``, ``assert``,
``error``, ``pcall``, ``pairs``/``ipairs``, ``tostring``/``tonumber``,
and ``require"cjson"`` (mapped to Python ``json``).  It is a
tree-walking evaluator over Python values: Lua nil/boolean/number/
string map to None/bool/int|float/str, tables to :class:`LuaTable`,
functions to Python callables (multi-value returns become tuples).

NOT implemented (filters don't need them, loud errors if used):
goto/labels, coroutines, metatables, varargs ``...``, io/os libraries,
and full Lua string patterns (``find``/``gsub``/``match`` support plain
substrings and the common character-class patterns only).
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Optional

__all__ = ["LuaError", "LuaTable", "lua_execute"]


class LuaError(Exception):
    """Runtime or syntax error raised from Lua code (``error()``,
    ``assert()``, bad syntax, or unsupported constructs)."""


# --------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------

_KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for",
    "function", "if", "in", "local", "nil", "not", "or", "repeat",
    "return", "then", "true", "until", "while",
}

# longest-first so `==` wins over `=`, `..` over `.`
_SYMBOLS = [
    "...", "..", "==", "~=", "<=", ">=", "//",
    "+", "-", "*", "/", "%", "^", "#", "<", ">", "=",
    "(", ")", "{", "}", "[", "]", ";", ":", ",", ".",
]

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM_RE = re.compile(
    r"0[xX][0-9a-fA-F]+|\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+(?:[eE][+-]?\d+)?")

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b",
            "f": "\f", "v": "\v", "\\": "\\", '"': '"', "'": "'",
            "\n": "\n", "0": "\0"}


class _Tok:
    __slots__ = ("kind", "value", "line")

    def __init__(self, kind: str, value: Any, line: int):
        self.kind = kind          # name | number | string | sym | kw | eof
        self.value = value
        self.line = line

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Tok({self.kind},{self.value!r},l{self.line})"


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n, line = 0, len(src), 1
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if src.startswith("--", i):
            if src.startswith("--[[", i):        # long comment
                end = src.find("]]", i + 4)
                if end < 0:
                    raise LuaError(f"unterminated long comment at line {line}")
                line += src.count("\n", i, end)
                i = end + 2
            else:
                nl = src.find("\n", i)
                i = n if nl < 0 else nl
            continue
        if c in "\"'":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    if j + 1 >= n:
                        raise LuaError(f"bad escape at line {line}")
                    esc = src[j + 1]
                    if esc.isdigit():            # \ddd decimal escape
                        k = j + 1
                        num = ""
                        while k < n and src[k].isdigit() and len(num) < 3:
                            num += src[k]
                            k += 1
                        buf.append(chr(int(num)))
                        j = k
                        continue
                    buf.append(_ESCAPES.get(esc, esc))
                    j += 2
                else:
                    if src[j] == "\n":
                        raise LuaError(f"unterminated string at line {line}")
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise LuaError(f"unterminated string at line {line}")
            toks.append(_Tok("string", "".join(buf), line))
            i = j + 1
            continue
        if src.startswith("[[", i):              # long string
            end = src.find("]]", i + 2)
            if end < 0:
                raise LuaError(f"unterminated long string at line {line}")
            body = src[i + 2:end]
            if body.startswith("\n"):
                body = body[1:]
            toks.append(_Tok("string", body, line))
            line += src.count("\n", i, end)
            i = end + 2
            continue
        m = _NUM_RE.match(src, i)
        if m and (c.isdigit() or (c == "." and m.end() > i + 1)):
            text = m.group(0)
            if text.lower().startswith("0x"):
                val: Any = int(text, 16)
            elif any(ch in text for ch in ".eE") and not \
                    text.lower().startswith("0x"):
                val = float(text)
            else:
                val = int(text)
            toks.append(_Tok("number", val, line))
            i = m.end()
            continue
        m = _NAME_RE.match(src, i)
        if m:
            word = m.group(0)
            toks.append(_Tok("kw" if word in _KEYWORDS else "name",
                             word, line))
            i = m.end()
            continue
        for sym in _SYMBOLS:
            if src.startswith(sym, i):
                toks.append(_Tok("sym", sym, line))
                i += len(sym)
                break
        else:
            raise LuaError(f"unexpected character {c!r} at line {line}")
    toks.append(_Tok("eof", None, line))
    return toks


# --------------------------------------------------------------------
# Parser — produces a tuple-based AST: (op, ...)
# --------------------------------------------------------------------

class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.pos = 0

    # -- token helpers -------------------------------------------------
    def peek(self) -> _Tok:
        return self.toks[self.pos]

    def next(self) -> _Tok:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def check(self, kind: str, value: Optional[str] = None) -> bool:
        t = self.peek()
        return t.kind == kind and (value is None or t.value == value)

    def accept(self, kind: str, value: Optional[str] = None) -> bool:
        if self.check(kind, value):
            self.pos += 1
            return True
        return False

    def expect(self, kind: str, value: Optional[str] = None) -> _Tok:
        t = self.peek()
        if not self.check(kind, value):
            raise LuaError(
                f"line {t.line}: expected {value or kind}, got "
                f"{t.value!r}")
        return self.next()

    # -- grammar -------------------------------------------------------
    _BLOCK_ENDERS = {"end", "else", "elseif", "until"}

    def block(self) -> tuple:
        stmts = []
        while True:
            t = self.peek()
            if t.kind == "eof" or (t.kind == "kw" and
                                   t.value in self._BLOCK_ENDERS):
                break
            if t.kind == "kw" and t.value == "return":
                self.next()
                exprs = []
                if not (self.peek().kind == "eof" or
                        (self.peek().kind == "kw" and
                         self.peek().value in self._BLOCK_ENDERS) or
                        self.check("sym", ";")):
                    exprs = self.exprlist()
                self.accept("sym", ";")
                stmts.append(("return", exprs))
                break
            if t.kind == "kw" and t.value == "break":
                self.next()
                self.accept("sym", ";")
                stmts.append(("break",))
                break
            stmts.append(self.statement())
        return ("block", stmts)

    def statement(self) -> tuple:
        t = self.peek()
        if self.accept("sym", ";"):
            return ("nop",)
        if t.kind == "kw":
            if t.value == "local":
                self.next()
                if self.accept("kw", "function"):
                    name = self.expect("name").value
                    fn = self.funcbody()
                    return ("localfunc", name, fn)
                names = [self.expect("name").value]
                while self.accept("sym", ","):
                    names.append(self.expect("name").value)
                exprs = self.exprlist() if self.accept("sym", "=") else []
                return ("local", names, exprs)
            if t.value == "function":
                self.next()
                # funcname: Name {"." Name} [":" Name]
                target: tuple = ("name", self.expect("name").value)
                is_method = False
                while True:
                    if self.accept("sym", "."):
                        target = ("index", target,
                                  ("const", self.expect("name").value))
                    elif self.accept("sym", ":"):
                        target = ("index", target,
                                  ("const", self.expect("name").value))
                        is_method = True
                        break
                    else:
                        break
                fn = self.funcbody(is_method=is_method)
                return ("assign", [target], [fn])
            if t.value == "if":
                self.next()
                arms = []
                cond = self.expr()
                self.expect("kw", "then")
                arms.append((cond, self.block()))
                while self.accept("kw", "elseif"):
                    c = self.expr()
                    self.expect("kw", "then")
                    arms.append((c, self.block()))
                els = self.block() if self.accept("kw", "else") else None
                self.expect("kw", "end")
                return ("if", arms, els)
            if t.value == "while":
                self.next()
                cond = self.expr()
                self.expect("kw", "do")
                body = self.block()
                self.expect("kw", "end")
                return ("while", cond, body)
            if t.value == "repeat":
                self.next()
                body = self.block()
                self.expect("kw", "until")
                cond = self.expr()
                return ("repeat", body, cond)
            if t.value == "for":
                self.next()
                first = self.expect("name").value
                if self.accept("sym", "="):
                    start = self.expr()
                    self.expect("sym", ",")
                    stop = self.expr()
                    step = self.expr() if self.accept("sym", ",") \
                        else ("const", 1)
                    self.expect("kw", "do")
                    body = self.block()
                    self.expect("kw", "end")
                    return ("fornum", first, start, stop, step, body)
                names = [first]
                while self.accept("sym", ","):
                    names.append(self.expect("name").value)
                self.expect("kw", "in")
                exprs = self.exprlist()
                self.expect("kw", "do")
                body = self.block()
                self.expect("kw", "end")
                return ("forin", names, exprs, body)
            if t.value == "do":
                self.next()
                body = self.block()
                self.expect("kw", "end")
                return ("do", body)
        # exprstat: assignment or call
        e = self.suffixedexp()
        if self.check("sym", "=") or self.check("sym", ","):
            targets = [e]
            while self.accept("sym", ","):
                targets.append(self.suffixedexp())
            self.expect("sym", "=")
            exprs = self.exprlist()
            for tgt in targets:
                if tgt[0] not in ("name", "index"):
                    raise LuaError("cannot assign to this expression")
            return ("assign", targets, exprs)
        if e[0] not in ("call", "method"):
            raise LuaError(
                f"line {t.line}: syntax error (expression is not a "
                "statement)")
        return ("exprstat", e)

    def funcbody(self, is_method: bool = False) -> tuple:
        self.expect("sym", "(")
        params = ["self"] if is_method else []
        if not self.check("sym", ")"):
            while True:
                if self.accept("sym", "..."):
                    raise LuaError("varargs (...) not supported")
                params.append(self.expect("name").value)
                if not self.accept("sym", ","):
                    break
        self.expect("sym", ")")
        body = self.block()
        self.expect("kw", "end")
        return ("function", params, body)

    def exprlist(self) -> list:
        exprs = [self.expr()]
        while self.accept("sym", ","):
            exprs.append(self.expr())
        return exprs

    # precedence climbing
    _BINPRI = {
        "or": (1, 1), "and": (2, 2),
        "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3),
        "~=": (3, 3), "==": (3, 3),
        "..": (9, 8),                       # right assoc
        "+": (10, 10), "-": (10, 10),
        "*": (11, 11), "/": (11, 11), "//": (11, 11), "%": (11, 11),
        "^": (14, 13),                      # right assoc
    }
    _UNARY_PRI = 12

    def expr(self, limit: int = 0) -> tuple:
        t = self.peek()
        if (t.kind == "kw" and t.value == "not") or \
                (t.kind == "sym" and t.value in ("-", "#")):
            op = self.next().value
            operand = self.expr(self._UNARY_PRI)
            left: tuple = ("unop", op, operand)
        else:
            left = self.simpleexp()
        while True:
            t = self.peek()
            key = t.value if (t.kind == "sym" or
                              (t.kind == "kw" and
                               t.value in ("and", "or"))) else None
            pri = self._BINPRI.get(key)  # type: ignore[arg-type]
            if pri is None or pri[0] <= limit:
                break
            self.next()
            right = self.expr(pri[1])
            left = ("binop", key, left, right)
        return left

    def simpleexp(self) -> tuple:
        t = self.peek()
        if t.kind == "number" or t.kind == "string":
            self.next()
            return ("const", t.value)
        if t.kind == "kw":
            if t.value == "nil":
                self.next()
                return ("const", None)
            if t.value == "true":
                self.next()
                return ("const", True)
            if t.value == "false":
                self.next()
                return ("const", False)
            if t.value == "function":
                self.next()
                return self.funcbody()
        if self.check("sym", "{"):
            return self.tablector()
        return self.suffixedexp()

    def primaryexp(self) -> tuple:
        if self.accept("sym", "("):
            e = self.expr()
            self.expect("sym", ")")
            return ("paren", e)
        t = self.expect("name")
        return ("name", t.value)

    def suffixedexp(self) -> tuple:
        e = self.primaryexp()
        while True:
            if self.accept("sym", "."):
                e = ("index", e, ("const", self.expect("name").value))
            elif self.accept("sym", "["):
                k = self.expr()
                self.expect("sym", "]")
                e = ("index", e, k)
            elif self.accept("sym", ":"):
                meth = self.expect("name").value
                args = self.callargs()
                e = ("method", e, meth, args)
            elif self.check("sym", "(") or self.check("string") or \
                    self.check("sym", "{"):
                e = ("call", e, self.callargs())
            else:
                return e

    def callargs(self) -> list:
        if self.check("string"):                 # f"literal"
            return [("const", self.next().value)]
        if self.check("sym", "{"):               # f{table}
            return [self.tablector()]
        self.expect("sym", "(")
        args: list = []
        if not self.check("sym", ")"):
            args = self.exprlist()
        self.expect("sym", ")")
        return args

    def tablector(self) -> tuple:
        self.expect("sym", "{")
        fields = []                              # (kind, key, value)
        while not self.check("sym", "}"):
            if self.accept("sym", "["):
                k = self.expr()
                self.expect("sym", "]")
                self.expect("sym", "=")
                fields.append(("k", k, self.expr()))
            elif self.check("name") and \
                    self.toks[self.pos + 1].kind == "sym" and \
                    self.toks[self.pos + 1].value == "=":
                name = self.next().value
                self.next()
                fields.append(("k", ("const", name), self.expr()))
            else:
                fields.append(("v", None, self.expr()))
            if not (self.accept("sym", ",") or self.accept("sym", ";")):
                break
        self.expect("sym", "}")
        return ("table", fields)


# --------------------------------------------------------------------
# Runtime values
# --------------------------------------------------------------------

class LuaTable:
    """A Lua table: one dict, 1-based integer keys for the array part.

    Supports Python-side ``t["k"]`` / ``t.get`` so host code can unpack
    lifecycle tables returned by filter modules."""

    __slots__ = ("data",)

    def __init__(self, data: Optional[dict] = None):
        self.data = dict(data) if data else {}

    # Lua semantics: missing key reads as nil; nil assignment deletes.
    def get(self, key):
        return self.data.get(_normkey(key))

    def set(self, key, value):
        key = _normkey(key)
        if key is None:
            raise LuaError("table index is nil")
        if value is None:
            self.data.pop(key, None)
        else:
            self.data[key] = value

    def length(self) -> int:
        n = 0
        while (n + 1) in self.data:
            n += 1
        return n

    # host-side conveniences
    def __getitem__(self, key):
        return self.get(key)

    def __contains__(self, key):
        return _normkey(key) in self.data

    def __len__(self):
        return self.length()

    def __repr__(self):  # pragma: no cover - debug aid
        return f"LuaTable({self.data!r})"


def _normkey(key):
    # Lua: t[1.0] and t[1] are the same slot.
    if isinstance(key, float) and key.is_integer():
        return int(key)
    return key


def _truthy(v) -> bool:
    return v is not None and v is not False


def _tostring(v) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if v.is_integer() and abs(v) < 1e16:
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, (int, str)):
        return str(v)
    if isinstance(v, LuaTable):
        return f"table: 0x{id(v):012x}"
    if callable(v):
        return f"function: 0x{id(v):012x}"
    return str(v)


def _tonumber(v, base=None):
    if base is not None:
        try:
            return int(str(v).strip(), int(base))
        except ValueError:
            return None
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return v
    if isinstance(v, str):
        s = v.strip()
        try:
            return int(s, 16) if s.lower().startswith("0x") else int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return None
    return None


def _arith_num(v, op: str):
    n = _tonumber(v)
    if n is None:
        raise LuaError(
            f"attempt to perform arithmetic ({op}) on a "
            f"{_typename(v)} value")
    return n


def _typename(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, LuaTable):
        return "table"
    if callable(v):
        return "function"
    return "userdata"


# --------------------------------------------------------------------
# Lua string patterns → Python re (common subset)
# --------------------------------------------------------------------

_CLASS_MAP = {"a": "[a-zA-Z]", "A": "[^a-zA-Z]", "d": r"\d", "D": r"\D",
              "l": "[a-z]", "L": "[^a-z]", "s": r"\s", "S": r"\S",
              "u": "[A-Z]", "U": "[^A-Z]", "w": "[a-zA-Z0-9]",
              "W": "[^a-zA-Z0-9]", "p": r"[\!-/\:-@\[-`\{-~]",
              "c": r"[\x00-\x1f]", "x": "[0-9a-fA-F]"}


def _lua_pattern_to_re(pat: str) -> str:
    out = []
    i, n = 0, len(pat)
    if pat.startswith("^"):
        out.append("^")
        i = 1
    while i < n:
        c = pat[i]
        if c == "%":
            if i + 1 >= n:
                raise LuaError("malformed pattern (ends with '%')")
            nc = pat[i + 1]
            if nc in _CLASS_MAP:
                out.append(_CLASS_MAP[nc])
            elif nc.isdigit():
                out.append("\\" + nc)            # back-reference
            else:
                out.append(re.escape(nc))
            i += 2
            continue
        if c == "[":                             # set, may contain %classes
            j = i + 1
            neg = False
            if j < n and pat[j] == "^":
                neg = True
                j += 1
            parts = []
            while j < n and pat[j] != "]":
                if pat[j] == "%" and j + 1 < n:
                    nc = pat[j + 1]
                    cls = _CLASS_MAP.get(nc)
                    parts.append(cls[1:-1] if cls and cls.startswith("[")
                                 else (cls if cls else re.escape(nc)))
                    j += 2
                else:
                    ch = pat[j]
                    parts.append(ch if ch == "-" else re.escape(ch))
                    j += 1
            if j >= n:
                raise LuaError("malformed pattern (missing ']')")
            out.append("[" + ("^" if neg else "") + "".join(parts) + "]")
            i = j + 1
            continue
        if c == "-":
            out.append("*?")                     # lazy star
            i += 1
            continue
        if c == "$" and i == n - 1:
            out.append("$")
            i += 1
            continue
        if c in ".*+?()":
            out.append(c)
            i += 1
            continue
        out.append(re.escape(c))
        i += 1
    return "".join(out)


# --------------------------------------------------------------------
# Standard library (the slice filters use)
# --------------------------------------------------------------------

def _lua_sub(s: str, i, j=None):
    n = len(s)
    i = int(i)
    j = n if j is None else int(j)
    if i < 0:
        i = max(n + i + 1, 1)
    elif i == 0:
        i = 1
    if j < 0:
        j = n + j + 1
    elif j > n:
        j = n
    if i > j:
        return ""
    return s[i - 1:j]


def _lua_find(s: str, pat: str, init=1, plain=None):
    init = int(init)
    start = (init - 1) if init > 0 else max(len(s) + init, 0)
    if _truthy(plain):
        idx = s.find(pat, start)
        if idx < 0:
            return None
        return (idx + 1, idx + len(pat))
    m = re.compile(_lua_pattern_to_re(pat)).search(s, start)
    if not m:
        return None
    res = [m.start() + 1, m.end()]
    res.extend(m.groups())
    return tuple(res)


def _lua_match(s: str, pat: str, init=1):
    init = int(init)
    start = (init - 1) if init > 0 else max(len(s) + init, 0)
    m = re.compile(_lua_pattern_to_re(pat)).search(s, start)
    if not m:
        return None
    g = m.groups()
    if not g:
        return m.group(0)
    return g if len(g) > 1 else g[0]


def _lua_gsub(s: str, pat: str, repl, maxn=None):
    rx = re.compile(_lua_pattern_to_re(pat))
    count = [0]

    def do(m: re.Match) -> str:
        count[0] += 1
        if callable(repl):
            args = m.groups() if m.groups() else (m.group(0),)
            out = repl(*args)
            if isinstance(out, tuple):
                out = out[0] if out else None
            return m.group(0) if out is None or out is False \
                else _tostring(out)
        if isinstance(repl, LuaTable):
            key = m.group(1) if m.groups() else m.group(0)
            out = repl.get(key)
            return m.group(0) if out is None else _tostring(out)
        text = str(repl)
        buf = []
        k = 0
        while k < len(text):
            if text[k] == "%" and k + 1 < len(text):
                nc = text[k + 1]
                if nc == "0":
                    buf.append(m.group(0))
                elif nc.isdigit():
                    buf.append(m.group(int(nc)) or "")
                else:
                    buf.append(nc)
                k += 2
            else:
                buf.append(text[k])
                k += 1
        return "".join(buf)

    out = rx.sub(do, s, count=0 if maxn is None else int(maxn))
    return (out, count[0])


def _lua_format(fmt: str, *args):
    out = []
    i, ai = 0, 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        j = i + 1
        while j < len(fmt) and fmt[j] in "-+ #0123456789.":
            j += 1
        if j >= len(fmt):
            raise LuaError("invalid format string")
        conv = fmt[j]
        spec = fmt[i:j + 1]
        if conv == "%":
            out.append("%")
        else:
            arg = args[ai]
            ai += 1
            if conv in "di":
                out.append((spec[:-1] + "d") %
                           int(_arith_num(arg, "format")))
            elif conv in "eEfgG":
                out.append(spec % float(_arith_num(arg, "format")))
            elif conv in "xXo":
                out.append(spec % int(_arith_num(arg, "format")))
            elif conv == "s":
                out.append(spec % _tostring(arg))
            elif conv == "q":
                out.append(json.dumps(_tostring(arg)))
            else:
                raise LuaError(f"unsupported format %{conv}")
        i = j + 1
    return "".join(out)


def _make_string_lib() -> LuaTable:
    return LuaTable({
        "lower": lambda s: str(s).lower(),
        "upper": lambda s: str(s).upper(),
        "len": lambda s: len(str(s)),
        "sub": _lua_sub,
        "rep": lambda s, n, sep=None: (str(sep or "")).join(
            [str(s)] * max(int(n), 0)),
        "reverse": lambda s: str(s)[::-1],
        "byte": lambda s, i=1, j=None: tuple(
            ord(ch) for ch in _lua_sub(str(s), i, i if j is None else j)
        ) or None,
        "char": lambda *codes: "".join(chr(int(c)) for c in codes),
        "find": _lua_find,
        "match": _lua_match,
        "gsub": _lua_gsub,
        "format": _lua_format,
    })


def _make_table_lib() -> LuaTable:
    def insert(t: LuaTable, a, b=_ESCAPES):   # sentinel default
        if b is _ESCAPES:
            t.set(t.length() + 1, a)
        else:
            pos = int(a)
            for k in range(t.length(), pos - 1, -1):
                t.set(k + 1, t.get(k))
            t.set(pos, b)

    def remove(t: LuaTable, pos=None):
        n = t.length()
        if n == 0:
            return None
        pos = n if pos is None else int(pos)
        val = t.get(pos)
        for k in range(pos, n):
            t.set(k, t.get(k + 1))
        t.set(n, None)
        return val

    def concat(t: LuaTable, sep="", i=1, j=None):
        j = t.length() if j is None else int(j)
        return str(sep).join(_tostring(t.get(k))
                             for k in range(int(i), j + 1))

    def sort(t: LuaTable, comp=None):
        items = [t.get(k) for k in range(1, t.length() + 1)]
        if comp is None:
            items.sort()
        else:
            import functools

            def cmp(a, b):
                r = comp(a, b)
                if isinstance(r, tuple):
                    r = r[0] if r else None
                return -1 if _truthy(r) else 1
            items.sort(key=functools.cmp_to_key(cmp))
        for k, v in enumerate(items, 1):
            t.set(k, v)

    return LuaTable({"insert": insert, "remove": remove,
                     "concat": concat, "sort": sort,
                     "unpack": lambda t: tuple(
                         t.get(k) for k in range(1, t.length() + 1))})


def _make_math_lib() -> LuaTable:
    import math as _m
    return LuaTable({
        "floor": lambda x: int(_m.floor(_arith_num(x, "floor"))),
        "ceil": lambda x: int(_m.ceil(_arith_num(x, "ceil"))),
        "abs": lambda x: abs(_arith_num(x, "abs")),
        "max": lambda *xs: max(_arith_num(x, "max") for x in xs),
        "min": lambda *xs: min(_arith_num(x, "min") for x in xs),
        "sqrt": lambda x: _m.sqrt(_arith_num(x, "sqrt")),
        "huge": _m.inf,
        "pi": _m.pi,
        "fmod": lambda a, b: _m.fmod(_arith_num(a, "fmod"),
                                     _arith_num(b, "fmod")),
        "modf": lambda x: (float(int(_arith_num(x, "modf"))),
                           _arith_num(x, "modf") -
                           int(_arith_num(x, "modf"))),
        "tointeger": lambda x: int(x) if isinstance(x, (int, float))
        and float(x).is_integer() else None,
        "type": lambda x: ("integer" if isinstance(x, int) else "float")
        if isinstance(x, (int, float)) and not isinstance(x, bool)
        else None,
    })


def _json_to_lua(v):
    if isinstance(v, dict):
        return LuaTable({k: _json_to_lua(x) for k, x in v.items()})
    if isinstance(v, list):
        return LuaTable({i + 1: _json_to_lua(x) for i, x in enumerate(v)})
    return v


def _lua_to_json(v):
    if isinstance(v, LuaTable):
        n = v.length()
        if n and len(v.data) == n:
            return [_lua_to_json(v.get(k)) for k in range(1, n + 1)]
        return {str(k): _lua_to_json(x) for k, x in v.data.items()}
    return v


def _make_cjson_lib() -> LuaTable:
    return LuaTable({
        "decode": lambda s: _json_to_lua(json.loads(s)),
        "encode": lambda v: json.dumps(_lua_to_json(v)),
    })


def _std_require(name: str):
    if name in ("cjson", "cjson.safe"):
        return _make_cjson_lib()
    if name == "string":
        return _make_string_lib()
    if name == "table":
        return _make_table_lib()
    if name == "math":
        return _make_math_lib()
    raise LuaError(f"module {name!r} not available in the embedded "
                   "Lua subset (cjson/string/table/math only)")


def _lua_pairs(t):
    if not isinstance(t, LuaTable):
        raise LuaError(f"bad argument to 'pairs' ({_typename(t)})")
    items = list(t.data.items())
    idx = [0]

    def nxt(*_ignored):
        if idx[0] >= len(items):
            return None
        k, v = items[idx[0]]
        idx[0] += 1
        return (k, v)

    return (nxt, t, None)


def _lua_ipairs(t):
    if not isinstance(t, LuaTable):
        raise LuaError(f"bad argument to 'ipairs' ({_typename(t)})")

    def nxt(tt, i):
        i = int(i) + 1
        v = tt.get(i)
        if v is None:
            return None
        return (i, v)

    return (nxt, t, 0)


def _make_globals(extra_env: Optional[dict]) -> dict:
    def lua_assert(v, msg=None, *rest):
        if not _truthy(v):
            raise LuaError(_tostring(msg) if msg is not None
                           else "assertion failed!")
        return (v, msg, *rest) if rest or msg is not None else v

    def lua_error(msg, _level=None):
        raise LuaError(_tostring(msg))

    def lua_pcall(fn, *args):
        try:
            out = fn(*args)
        except LuaError as e:
            return (False, str(e))
        except ZeroDivisionError:
            return (False, "attempt to perform 'n/0'")
        if isinstance(out, tuple):
            return (True, *out)
        return (True, out) if out is not None else True

    def lua_select(n, *args):
        if n == "#":
            return len(args)
        return args[int(n) - 1:]

    def lua_next(t: LuaTable, key=None):
        keys = list(t.data.keys())
        if key is None:
            i = 0
        else:
            try:
                i = keys.index(_normkey(key)) + 1
            except ValueError:
                raise LuaError("invalid key to 'next'")
        if i >= len(keys):
            return None
        return (keys[i], t.data[keys[i]])

    g = {
        "assert": lua_assert,
        "error": lua_error,
        "pcall": lua_pcall,
        "type": lambda v: _typename(v),
        "tostring": _tostring,
        "tonumber": _tonumber,
        "print": lambda *a: print("\t".join(_tostring(x) for x in a)),
        "pairs": _lua_pairs,
        "ipairs": _lua_ipairs,
        "next": lua_next,
        "select": lua_select,
        "require": _std_require,
        "rawget": lambda t, k: t.get(k),
        "rawset": lambda t, k, v: (t.set(k, v), t)[1],
        "rawequal": lambda a, b: a is b or a == b,
        "rawlen": lambda t: t.length() if isinstance(t, LuaTable)
        else len(t),
        "unpack": lambda t: tuple(t.get(k)
                                  for k in range(1, t.length() + 1)),
        "string": _make_string_lib(),
        "table": _make_table_lib(),
        "math": _make_math_lib(),
        "tostring_lua": _tostring,
        "_VERSION": "Lua 5.4 (nxsearch_ray embedded subset)",
    }
    if extra_env:
        g.update(extra_env)
    return g


# --------------------------------------------------------------------
# Evaluator
# --------------------------------------------------------------------

class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, values: tuple):
        self.values = values


class _Scope:
    __slots__ = ("vars", "parent")

    def __init__(self, parent: Optional["_Scope"] = None,
                 vars: Optional[dict] = None):
        self.vars = vars if vars is not None else {}
        self.parent = parent

    def lookup(self, name: str) -> Optional["_Scope"]:
        s: Optional[_Scope] = self
        while s is not None:
            if name in s.vars:
                return s
            s = s.parent
        return None


class _Interp:
    def __init__(self, globals_: dict):
        self.globals = globals_

    # -- values --------------------------------------------------------
    def first(self, v):
        """Adjust a possibly-multi value to one value."""
        if isinstance(v, tuple):
            return v[0] if v else None
        return v

    def eval(self, node: tuple, scope: _Scope):
        """Evaluate an expression to a single (adjusted) value."""
        return self.first(self.eval_multi(node, scope))

    def eval_multi(self, node: tuple, scope: _Scope):
        op = node[0]
        if op == "const":
            return node[1]
        if op == "name":
            s = scope.lookup(node[1])
            if s is not None:
                return s.vars[node[1]]
            return self.globals.get(node[1])
        if op == "paren":
            return self.first(self.eval_multi(node[1], scope))
        if op == "index":
            obj = self.eval(node[1], scope)
            key = self.eval(node[2], scope)
            return self.index(obj, key)
        if op == "call":
            fn = self.eval(node[1], scope)
            args = self.eval_args(node[2], scope)
            return self.call(fn, args, node[1])
        if op == "method":
            obj = self.eval(node[1], scope)
            meth = node[2]
            fn = self.index(obj, meth)
            if fn is None:
                raise LuaError(f"attempt to call a nil value "
                               f"(method '{meth}')")
            args = [obj] + self.eval_args(node[3], scope)
            return self.call(fn, args, node)
        if op == "function":
            return self.make_closure(node, scope)
        if op == "table":
            t = LuaTable()
            fields = node[1]
            arr_i = 1
            for fi, (kind, k, vexpr) in enumerate(fields):
                if kind == "k":
                    t.set(self.eval(k, scope), self.eval(vexpr, scope))
                else:
                    if fi == len(fields) - 1:    # last positional expands
                        v = self.eval_multi(vexpr, scope)
                        if isinstance(v, tuple):
                            for item in v:
                                t.set(arr_i, item)
                                arr_i += 1
                            continue
                    t.set(arr_i, self.eval(vexpr, scope))
                    arr_i += 1
            return t
        if op == "binop":
            return self.binop(node[1], node[2], node[3], scope)
        if op == "unop":
            return self.unop(node[1], node[2], scope)
        raise LuaError(f"cannot evaluate node {op!r}")

    def eval_args(self, exprs: list, scope: _Scope) -> list:
        args: list = []
        for i, e in enumerate(exprs):
            v = self.eval_multi(e, scope)
            if i == len(exprs) - 1 and isinstance(v, tuple):
                args.extend(v)
            else:
                args.append(self.first(v))
        return args

    def index(self, obj, key):
        if isinstance(obj, LuaTable):
            return obj.get(key)
        if isinstance(obj, str):
            # strings index the string library (s:lower() sugar)
            lib = self.globals.get("string")
            if isinstance(lib, LuaTable):
                return lib.get(key)
            return None
        if obj is None:
            raise LuaError(
                f"attempt to index a nil value (key {key!r})")
        raise LuaError(f"attempt to index a {_typename(obj)} value")

    def call(self, fn, args: list, where=None):
        if not callable(fn):
            raise LuaError(f"attempt to call a {_typename(fn)} value")
        return fn(*args)

    def make_closure(self, node: tuple, scope: _Scope) -> Callable:
        _, params, body = node

        def closure(*args):
            s = _Scope(scope)
            for i, p in enumerate(params):
                s.vars[p] = args[i] if i < len(args) else None
            try:
                self.exec_block(body, s)
            except _Return as r:
                vals = r.values
                if len(vals) == 0:
                    return None
                if len(vals) == 1:
                    return vals[0]
                return tuple(vals)
            return None

        return closure

    # -- operators -----------------------------------------------------
    def binop(self, op: str, le, re_, scope: _Scope):
        if op == "and":
            lv = self.eval(le, scope)
            return self.eval(re_, scope) if _truthy(lv) else lv
        if op == "or":
            lv = self.eval(le, scope)
            return lv if _truthy(lv) else self.eval(re_, scope)
        a = self.eval(le, scope)
        b = self.eval(re_, scope)
        if op == "..":
            for v in (a, b):
                if not isinstance(v, (str, int, float)) or \
                        isinstance(v, bool):
                    raise LuaError("attempt to concatenate a "
                                   f"{_typename(v)} value")
            return (_tostring(a) if not isinstance(a, str) else a) + \
                   (_tostring(b) if not isinstance(b, str) else b)
        if op == "==":
            return self._eq(a, b)
        if op == "~=":
            return not self._eq(a, b)
        if op in ("<", "<=", ">", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            elif isinstance(a, (int, float)) and \
                    isinstance(b, (int, float)) and \
                    not isinstance(a, bool) and not isinstance(b, bool):
                pass
            else:
                raise LuaError(
                    f"attempt to compare {_typename(a)} with "
                    f"{_typename(b)}")
            return {"<": a < b, "<=": a <= b,
                    ">": a > b, ">=": a >= b}[op]
        x = _arith_num(a, op)
        y = _arith_num(b, op)
        if op == "+":
            return x + y
        if op == "-":
            return x - y
        if op == "*":
            return x * y
        if op == "/":
            if y == 0:
                return float("inf") if x > 0 else (
                    float("-inf") if x < 0 else float("nan"))
            return x / y
        if op == "//":
            if y == 0:
                raise LuaError("attempt to perform 'n//0'")
            r = x // y
            return int(r) if isinstance(x, int) and isinstance(y, int) \
                else float(r)
        if op == "%":
            if y == 0:
                if isinstance(x, int) and isinstance(y, int):
                    raise LuaError("attempt to perform 'n%%0'")
                return float("nan")
            return x - (x // y) * y
        if op == "^":
            return float(x) ** float(y)
        raise LuaError(f"unsupported operator {op!r}")

    @staticmethod
    def _eq(a, b) -> bool:
        if type(a) is bool or type(b) is bool:
            return a is b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return a == b
        if isinstance(a, str) and isinstance(b, str):
            return a == b
        return a is b

    def unop(self, op: str, operand, scope: _Scope):
        v = self.eval(operand, scope)
        if op == "not":
            return not _truthy(v)
        if op == "-":
            return -_arith_num(v, "unm")
        if op == "#":
            if isinstance(v, str):
                return len(v)
            if isinstance(v, LuaTable):
                return v.length()
            raise LuaError(f"attempt to get length of a "
                           f"{_typename(v)} value")
        raise LuaError(f"unsupported unary {op!r}")

    # -- statements ----------------------------------------------------
    def exec_block(self, block: tuple, scope: _Scope):
        for stmt in block[1]:
            self.exec_stmt(stmt, scope)

    def exec_stmt(self, stmt: tuple, scope: _Scope):
        op = stmt[0]
        if op == "nop":
            return
        if op == "exprstat":
            self.eval_multi(stmt[1], scope)
            return
        if op == "local":
            _, names, exprs = stmt
            vals = self.eval_args(exprs, scope)
            for i, name in enumerate(names):
                scope.vars[name] = vals[i] if i < len(vals) else None
            return
        if op == "localfunc":
            _, name, fnode = stmt
            scope.vars[name] = None              # visible to itself
            scope.vars[name] = self.make_closure(fnode, scope)
            return
        if op == "assign":
            _, targets, exprs = stmt
            vals = self.eval_args(exprs, scope)
            for i, tgt in enumerate(targets):
                v = vals[i] if i < len(vals) else None
                if tgt[0] == "name":
                    s = scope.lookup(tgt[1])
                    if s is not None:
                        s.vars[tgt[1]] = v
                    else:
                        self.globals[tgt[1]] = v
                else:                            # ("index", obj, key)
                    obj = self.eval(tgt[1], scope)
                    if not isinstance(obj, LuaTable):
                        raise LuaError("attempt to index a "
                                       f"{_typename(obj)} value")
                    obj.set(self.eval(tgt[2], scope), v)
            return
        if op == "return":
            vals = self.eval_args(stmt[1], scope)
            raise _Return(tuple(vals))
        if op == "break":
            raise _Break()
        if op == "if":
            _, arms, els = stmt
            for cond, body in arms:
                if _truthy(self.eval(cond, scope)):
                    self.exec_block(body, _Scope(scope))
                    return
            if els is not None:
                self.exec_block(els, _Scope(scope))
            return
        if op == "while":
            _, cond, body = stmt
            while _truthy(self.eval(cond, scope)):
                try:
                    self.exec_block(body, _Scope(scope))
                except _Break:
                    break
            return
        if op == "repeat":
            _, body, cond = stmt
            while True:
                inner = _Scope(scope)
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
                # the until-condition sees the body's locals
                if _truthy(self.eval(cond, inner)):
                    break
            return
        if op == "fornum":
            _, name, e1, e2, e3, body = stmt
            i = _arith_num(self.eval(e1, scope), "for")
            stop = _arith_num(self.eval(e2, scope), "for")
            step = _arith_num(self.eval(e3, scope), "for")
            if step == 0:
                raise LuaError("'for' step is zero")
            while (step > 0 and i <= stop) or (step < 0 and i >= stop):
                inner = _Scope(scope)
                inner.vars[name] = i
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
                i += step
            return
        if op == "forin":
            _, names, exprs, body = stmt
            vals = self.eval_args(exprs, scope)
            vals += [None] * (3 - len(vals))
            itfn, state, ctrl = vals[0], vals[1], vals[2]
            if not callable(itfn):
                raise LuaError("'for in' iterator is not a function")
            while True:
                out = itfn(state, ctrl)
                if out is None:
                    break
                row = out if isinstance(out, tuple) else (out,)
                if not row or row[0] is None:
                    break
                ctrl = row[0]
                inner = _Scope(scope)
                for i, nm in enumerate(names):
                    inner.vars[nm] = row[i] if i < len(row) else None
                try:
                    self.exec_block(body, inner)
                except _Break:
                    break
            return
        if op == "do":
            self.exec_block(stmt[1], _Scope(scope))
            return
        raise LuaError(f"cannot execute statement {op!r}")


# --------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------

def lua_execute(source: str, env: Optional[dict] = None):
    """Run a Lua chunk and return its ``return`` value(s).

    ``env`` entries become additional globals.  A single return value
    comes back as a Python value (tables as :class:`LuaTable`,
    functions as Python callables); multiple returns come back as a
    tuple; no return means None.
    """
    parser = _Parser(_tokenize(source))
    ast = parser.block()
    if parser.peek().kind != "eof":
        t = parser.peek()
        raise LuaError(f"line {t.line}: trailing input after block "
                       f"({t.value!r})")
    interp = _Interp(_make_globals(env))
    try:
        interp.exec_block(ast, _Scope())
    except _Return as r:
        vals = r.values
        if len(vals) == 0:
            return None
        if len(vals) == 1:
            return vals[0]
        return tuple(vals)
    return None
