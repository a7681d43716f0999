"""Embedded Lua-subset interpreter (functions/lua_mini.py) — the
runtime behind drop-in ``.lua`` filter modules when lupa is absent.

The contract under test is the reference's filter-module surface
(docs/lua-filters-api.md:19-80, src/core/filters_lua.c:224-289): a
chunk returning a ``{create, destroy, filter, cleanup}`` table, with
``create(json_params)`` decoding a JSON string via ``require "cjson"``
and ``filter`` returning string / (nil, nil) / (nil, err)."""

import os
import textwrap

import pytest

from nxsearch_ray.functions.lua_mini import LuaError, LuaTable, lua_execute

REF_FILTER = "/root/reference/src/tests/test_filter.lua"


@pytest.mark.parametrize("src,want", [
    # arithmetic / numbers
    ("return 1+2*3", 7),
    ("return 2^10", 1024.0),
    ("return 7 // 2, 7 % 3, -7 // 2", (3, 1, -4)),
    ("return 10 / 4", 2.5),
    ("return -(-5)", 5),
    # strings and concat
    ("return 'a'..'b'..1", "ab1"),
    ("return #'hello'", 5),
    ("return ('HeLLo'):lower(), ('abc'):upper(), ('hello'):sub(2,4)",
     ("hello", "ABC", "ell")),
    ("return string.sub('hello', -3)", "llo"),
    ("return string.rep('ab', 3, '-')", "ab-ab-ab"),
    ("return string.format('%s=%d %.2f %x', 'k', 42, 3.14159, 255)",
     "k=42 3.14 ff"),
    ("return string.byte('A'), string.char(97, 98)", (65, "ab")),
    # Lua patterns (common subset)
    ("return string.find('hello world', 'wor', 1, true)", (7, 9)),
    ("return string.find('hello world', 'o w')", (5, 7)),
    ("return string.match('key=value', '(%w+)=(%w+)')",
     ("key", "value")),
    ("return string.match('  x  ', '^%s*(.-)%s*$')", "x"),
    ("return string.gsub('hello world', 'o', '0')", ("hell0 w0rld", 2)),
    ("return string.gsub('abc', '%a', function(c) return c:upper() end)",
     ("ABC", 3)),
    ("return string.gsub('a1b2', '%d', '')", ("ab", 2)),
    # tables
    ("local t = {1,2,3,x=9}; return #t, t.x, t[2]", (3, 9, 2)),
    ("local t = {n=1}; t.n = t.n + 1; t['m'] = 5; return t.n + t.m", 7),
    ("local t = {3,1,2}; table.sort(t); return table.concat(t, ',')",
     "1,2,3"),
    ("local t = {}; table.insert(t, 'a'); table.insert(t, 1, 'b'); "
     "return table.concat(t)", "ba"),
    ("local t = {5,6,7}; return table.remove(t, 2), #t", (6, 2)),
    # control flow
    ("local s=0; for i=1,10 do s=s+i end; return s", 55),
    ("local s=0; for i=10,1,-2 do s=s+i end; return s", 30),
    ("local i=0; while true do i=i+1; if i>4 then break end end; "
     "return i", 5),
    ("local i=0; repeat i=i+1 until i>=3; return i", 3),
    ("if 0 then return 'zero-true' else return 'zero-false' end",
     "zero-true"),           # 0 is truthy in Lua
    ("local x = 3; if x < 2 then return 'a' elseif x < 4 then "
     "return 'b' else return 'c' end", "b"),
    # iterators
    ("local t={}; for i=1,3 do t[i]=i*i end; local s=''; "
     "for i,v in ipairs(t) do s=s..v..',' end; return s", "1,4,9,"),
    ("local n=0; for k,v in pairs({a=1,b=2}) do n=n+v end; return n", 3),
    # functions, closures, multiple returns
    ("local function f(a,b) return a+b, a-b end; local x,y = f(5,3); "
     "return x, y", (8, 2)),
    ("local function outer() local n=0; "
     "return function() n=n+1; return n end end; "
     "local c = outer(); c(); c(); return c()", 3),
])
def test_language_features(src, want):
    assert lua_execute(src) == want


@pytest.mark.parametrize("src,want", [
    # stdlib / builtins
    ("local ok, err = pcall(function() error('boom') end); "
     "return ok, err", (False, "boom")),
    ("return tostring(nil), tostring(true), tostring(1.5), tostring(3)",
     ("nil", "true", "1.5", "3")),
    ("return tonumber('42'), tonumber('0x10'), tonumber('x')",
     (42, 16, None)),
    ("return type({}), type(''), type(1), type(nil), type(print)",
     ("table", "string", "number", "nil", "function")),
    ("return math.floor(3.7), math.ceil(3.2), math.max(1,5,3), "
     "math.min(4,2)", (3, 4, 5, 2)),
    ("return select('#', 'a', 'b', 'c')", 3),
    ("local a = nil; return a or 'dflt', a and 'x'", ("dflt", None)),
    ("return not nil, not 0, not false", (True, False, True)),
    ("return 1 == 1.0, 'a' ~= 'b', nil == false", (True, True, False)),
    # cjson round-trip
    ("local cjson = require 'cjson'; "
     "local t = cjson.decode('{\"lang\": \"en\", \"n\": 3}'); "
     "return t.lang, t.n", ("en", 3)),
    ("local cjson = require 'cjson'; "
     "return cjson.encode({1, 2, 3})", "[1, 2, 3]"),
])
def test_stdlib(src, want):
    assert lua_execute(src) == want


def test_docs_example_module():
    """The exact example module from the reference's Lua filter docs
    (docs/lua-filters-api.md:57-76) runs under the embedded
    interpreter: create decodes JSON params, filter lowercases."""
    src = textwrap.dedent('''
        local cjson = require "cjson"

        return {
          create = function(json_params)
            local params = cjson.decode(json_params)
            return {["lang"] = params["lang"]}
          end,

          destroy = function(ctx)
            assert(ctx.lang == "en")
          end,

          filter = function(ctx, value)
            assert(ctx.lang == "en")
            return string.lower(value)
          end,
        }
    ''')
    table = lua_execute(src)
    assert isinstance(table, LuaTable)
    ctx = table["create"]('{"lang": "en"}')
    assert ctx["lang"] == "en"
    assert table["filter"](ctx, "HeLLo") == "hello"
    table["destroy"](ctx)          # must not raise
    # wrong language trips the module's own assert
    bad = table["create"]('{"lang": "de"}')
    with pytest.raises(LuaError):
        table["filter"](bad, "x")


def test_errors_are_loud():
    with pytest.raises(LuaError):
        lua_execute("return 1 +")                  # syntax
    with pytest.raises(LuaError):
        lua_execute("local f\nreturn f()")         # call nil
    with pytest.raises(LuaError):
        lua_execute("return nil .. 'x'")           # concat nil
    with pytest.raises(LuaError):
        lua_execute("error('custom')")
    with pytest.raises(LuaError):                  # unsupported: varargs
        lua_execute("local f = function(...) end")
    with pytest.raises(LuaError):                  # unsupported module
        lua_execute("return require 'socket'")


def test_host_env_injection():
    out = lua_execute("return greet .. ' ' .. name",
                      env={"greet": "hi", "name": "there"})
    assert out == "hi there"


@pytest.mark.skipif(not os.path.exists(REF_FILTER),
                    reason="reference checkout not present")
def test_reference_test_filter_source_runs_unmodified():
    """Drop-in proof: the reference's own src/tests/test_filter.lua
    (read from the read-only checkout, not copied) loads and runs."""
    with open(REF_FILTER) as f:
        table = lua_execute(f.read())
    ctx = table["create"]('{"lang": "en"}')
    assert table["filter"](ctx, "MiXeD") == "mixed"
    table["destroy"](ctx)
    table["cleanup"]()
