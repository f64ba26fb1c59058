"""Dialect surface audit (r10): every Trino scalar/aggregate/window
function below must either LOWER to SQL Spark can resolve, or refuse
with a named TrinoSqlUnsupported — never fall through to a bare
UNRESOLVED_ROUTINE (the failure mode that hid to_base32, hmac_*,
map_union, … until the r10 probe). Runtime/analysis TYPE errors are
fine; an unresolved routine is always a front-end gap.

The probe list is the Trino-400 function surface a migrating user can
reach (docs: functions/* chapters), expressed as runnable expressions
over a two-row fixture.
"""

from __future__ import annotations

import pytest

from okera_trino_spark.functions.trino_sql import (TrinoSqlUnsupported,
                                                   execute_trino)

#: (expression, aggregate?) — aggregates run with GROUP BY, scalars per row.
SURFACE = [
    # strings
    "chr(66)", "codepoint('a')", "concat(s, s)", "concat_ws('-', s, s)",
    "format('%s-%d', s, i)", "hamming_distance(s, s)", "index(s, 'a')",
    "length(s)", "levenshtein_distance(s, s)", "lower(s)", "lpad(s, 4, 'x')",
    "ltrim(s)", "luhn_check('79927398713')", "normalize(s)",
    "position('a' IN s)", "replace(s, 'a', 'b')", "reverse(s)",
    "rpad(s, 4, 'x')", "rtrim(s)", "soundex(s)", "split(s, 'a')",
    "split_part(s, 'a', 1)", "split_to_map('a=1', ',', '=')",
    "split_to_multimap('a=1', ',', '=')", "starts_with(s, 'a')",
    "strpos(s, 'a')", "strpos(s, 'a', 1)", "substr(s, 1, 1)",
    "translate(s, 'ab', 'xy')", "trim(s)", "upper(s)", "word_stem(s)",
    "char2hexint(s)", "to_utf8(s)", "from_utf8(to_utf8(s))",
    # regex
    "regexp_count(s, 'a')", "regexp_extract(s, 'a')",
    "regexp_extract_all(s, 'a')", "regexp_like(s, 'a')",
    "regexp_position(s, 'a')", "regexp_replace(s, 'a', 'b')",
    "regexp_split(s, 'a')",
    # math
    "abs(i)", "cbrt(d)", "ceil(d)", "ceiling(d)", "cos(d)", "cosh(d)",
    "degrees(d)", "e()", "exp(d)", "floor(d)", "from_base('11', 2)",
    "infinity()", "is_finite(d)", "is_infinite(d)", "is_nan(d)",
    "ln(d)", "log(2, d)", "log10(d)", "log2(d)", "mod(i, 2)", "nan()",
    "pi()", "pow(d, 2)", "power(d, 2)", "radians(d)", "rand()",
    "round(d)", "round(d, 1)", "sign(d)", "sin(d)", "sqrt(d)",
    "tan(d)", "tanh(d)", "to_base(i, 2)", "truncate(d)",
    "width_bucket(d, 0.0, 10.0, 4)", "wilson_interval_lower(1, 2, 1.96)",
    "wilson_interval_upper(1, 2, 1.96)", "cosine_similarity(ad, ad)",
    "beta_cdf(2.0, 3.0, 0.5)", "inverse_beta_cdf(2.0, 3.0, 0.5)",
    "normal_cdf(0.0, 1.0, 0.5)", "inverse_normal_cdf(0.0, 1.0, 0.5)",
    # bitwise
    "bit_count(i, 64)", "bitwise_and(i, 3)", "bitwise_left_shift(i, 1)",
    "bitwise_not(i)", "bitwise_or(i, 3)", "bitwise_right_shift(i, 1)",
    "bitwise_right_shift_arithmetic(i, 1)", "bitwise_xor(i, 3)",
    # datetime
    "date_add('day', 1, dt)", "date_diff('day', dt, dt)",
    "date_format(ts, '%Y')", "date_parse('2024-01-01', '%Y-%m-%d')",
    "date_trunc('day', ts)", "day(dt)", "day_of_month(dt)",
    "day_of_week(dt)", "day_of_year(dt)", "dow(dt)", "doy(dt)",
    "format_datetime(ts, 'yyyy')", "from_iso8601_date('2024-01-01')",
    "from_iso8601_timestamp('2024-01-01T00:00:00')", "from_unixtime(0)",
    "hour(ts)", "human_readable_seconds(3700)",
    "last_day_of_month(dt)", "millisecond(ts)", "minute(ts)",
    "month(dt)", "parse_datetime('2024-01-01', 'yyyy-MM-dd')",
    "parse_duration('5m')", "parse_duration(s || '1m')", "quarter(dt)",
    "second(ts)", "to_iso8601(dt)", "to_milliseconds(parse_duration('5m'))",
    "to_unixtime(ts)", "week(dt)", "week_of_year(dt)", "year(dt)",
    "year_of_week(dt)", "yow(dt)",
    # arrays
    "array_distinct(ai)", "array_except(ai, ai)", "array_intersect(ai, ai)",
    "array_join(transform(ai, x -> CAST(x AS VARCHAR)), ',')",
    "array_max(ai)", "array_min(ai)", "array_position(ai, 1)",
    "array_remove(ai, 1)", "array_sort(ai)", "array_union(ai, ai)",
    "arrays_overlap(ai, ai)", "cardinality(ai)", "combinations(ai, 2)",
    "contains(ai, 1)", "element_at(ai, 1)", "filter(ai, x -> x > 0)",
    "flatten(ARRAY[ai])", "ngrams(ai, 2)", "reduce(ai, 0, (a, b) -> a + b, a -> a)",
    "repeat(i, 2)", "reverse(ai)", "sequence(1, 3)", "shuffle(ai)",
    "slice(ai, 1, 1)", "transform(ai, x -> x + 1)", "zip(ai, ai)",
    "zip_with(ai, ai, (x, y) -> x + y)", "any_match(ai, x -> x > 0)",
    "all_match(ai, x -> x > 0)", "none_match(ai, x -> x > 0)",
    # maps
    "map(ARRAY['a'], ARRAY[i])", "map_concat(m, m)", "map_entries(m)",
    "map_filter(m, (k, v) -> v > 0)", "map_from_entries(map_entries(m))",
    "map_keys(m)", "map_values(m)", "multimap_from_entries(map_entries(m))",
    "transform_keys(m, (k, v) -> k)", "transform_values(m, (k, v) -> v)",
    "map_zip_with(m, m, (k, v1, v2) -> v1)",
    # binary / hash / codec
    "crc32(to_utf8(s))", "from_base32(to_base32(to_utf8(s)))",
    "from_base64(to_base64(to_utf8(s)))",
    "from_base64url(to_base64url(to_utf8(s)))",
    "from_big_endian_32(to_big_endian_32(i))",
    "from_big_endian_64(to_big_endian_64(i))", "from_hex(to_hex(to_utf8(s)))",
    "from_ieee754_32(to_ieee754_32(CAST(d AS REAL)))",
    "from_ieee754_64(to_ieee754_64(d))", "hmac_md5(to_utf8(s), to_utf8(s))",
    "hmac_sha1(to_utf8(s), to_utf8(s))", "hmac_sha256(to_utf8(s), to_utf8(s))",
    "hmac_sha512(to_utf8(s), to_utf8(s))", "md5(to_utf8(s))",
    "murmur3(to_utf8(s))", "spooky_hash_v2_64(to_utf8(s))",
    "sha1(to_utf8(s))", "sha256(to_utf8(s))", "sha512(to_utf8(s))",
    "xxhash64(to_utf8(s))",
    # json
    "json_array_contains('[1]', 1)", "json_array_length('[1]')",
    "json_extract('{\"a\":1}', '$.a')", "json_extract_scalar('{\"a\":1}', '$.a')",
    "json_format(json_parse('{\"a\":1}'))", "json_parse('{\"a\":1}')",
    "json_size('{\"a\":1}', '$')", "json_query('{\"a\":1}', 'lax $.a')",
    "json_value('{\"a\":1}', 'lax $.a')",
    "json_exists('{\"a\":1}', 'lax $.a')",
    # r10 SQL/JSON grammar surfaces
    "json_query('{\"a\":[1]}', 'lax $.a[*] ?((@ > 0 || @ == 0) && "
    "!(@ < 0))' WITH ARRAY WRAPPER)",
    "json_query('{\"a\":[[1],[2]]}', 'lax $.a[*][*].double()' "
    "WITH ARRAY WRAPPER)",
    "json_value('{\"a\":[{\"b\":1}]}', 'lax $.a[*] ?(exists(@.b)) .b')",
    "json_exists('{\"a\":[1]}', 'strict $.a[*]')",
    # r11 strict-mode surfaces
    "json_query('{\"a\":[1,2]}', 'strict $.a[last]')",
    "json_query('{\"a\":[{\"b\":1}]}', 'strict $.a[*] ?(!(@.b == 1))' "
    "WITH ARRAY WRAPPER)",
    "json_exists('{\"a\":[{\"b\":1}]}', 'strict $.a[*] ?(!exists(@.c))')",
    "json_value('{\"a\":[1,2,3]}', 'strict $.a[last]')",
    # r11 numeric item methods
    "json_query('{\"a\":2.3}', 'lax $.a.ceiling()')",
    "json_query('{\"a\":-0.5}', 'lax $.a.floor()')",
    "json_query('{\"a\":[-1.5,2]}', 'lax $.a[*].abs()' "
    "WITH ARRAY WRAPPER)",
    "json_query('{\"a\":[1,2,3]}', 'lax $.a[0 to 1]' "
    "WITH ARRAY WRAPPER)",
    "json_query('{\"a\":[1,2,3]}', 'strict $.a[1 to last]' "
    "WITH ARRAY WRAPPER)",
    "json_query('{\"k\":[{\"x\":1.5}]}', "
    "'lax $.k[*] ?(@.x.ceiling() == 2).x')",
    # url
    "url_decode(url_encode(s))", "url_extract_fragment('http://x.com/#f')",
    "url_extract_host('http://x.com/')", "url_extract_parameter('http://x.com/?q=1', 'q')",
    "url_extract_path('http://x.com/p')", "url_extract_port('http://x.com:81/')",
    "url_extract_protocol('http://x.com/')", "url_extract_query('http://x.com/?q=1')",
    # misc
    "coalesce(NULL, i)", "greatest(i, 2)", "if(TRUE, 1, 2)", "least(i, 2)",
    "nullif(i, 1)", "try(ln(d))", "try_cast(s AS INTEGER)", "typeof(d)",
    "uuid()", "version()", "current_timezone()",
    "current_catalog", "current_schema", "current_date", "localtime",
    "localtimestamp", "current_user",
    "bar(0.5, 10)", "color('red')", "json_array_get('[1]', 0)",
]

AGGREGATES = [
    "cardinality(approx_set(s))", "cardinality(approx_set(s, 0.02))",
    "cardinality(merge(h))",
    "value_at_quantile(qdigest_agg(d), 0.5)", "tdigest_agg(d)",
    "any_value(i)", "approx_distinct(s)", "approx_most_frequent(2, s, 3)",
    "approx_percentile(d, 0.5)", "arbitrary(i)", "array_agg(i)", "avg(d)",
    "bitwise_and_agg(i)", "bitwise_or_agg(i)", "bool_and(i > 0)",
    "bool_or(i > 0)", "corr(d, i)", "count(*)", "count(i)", "count_if(i > 0)",
    "covar_pop(d, i)", "covar_samp(d, i)", "every(i > 0)",
    "geometric_mean(d)", "histogram(s)", "kurtosis(d)",
    "listagg(s, ',') WITHIN GROUP (ORDER BY s)", "map_agg(s, i)",
    "map_union(m)", "max(i)", "max(i, 2)", "max_by(s, i)", "min(i)",
    "min(i, 2)", "min_by(s, i)", "multimap_agg(s, i)",
    "regr_intercept(d, i)", "regr_slope(d, i)", "skewness(d)",
    "stddev(d)", "stddev_pop(d)", "stddev_samp(d)", "sum(i)",
    "variance(d)", "var_pop(d)", "var_samp(d)",
]

WINDOWS = [
    "cume_dist() OVER (ORDER BY i)", "dense_rank() OVER (ORDER BY i)",
    "first_value(i) OVER (ORDER BY i)", "lag(i) OVER (ORDER BY i)",
    "last_value(i) OVER (ORDER BY i)", "lead(i, 1, 0) OVER (ORDER BY i)",
    "nth_value(i, 1) OVER (ORDER BY i)", "ntile(2) OVER (ORDER BY i)",
    "percent_rank() OVER (ORDER BY i)", "rank() OVER (ORDER BY i)",
    "row_number() OVER (ORDER BY i)",
]

_FIXTURE = (
    "(SELECT 1 AS i, 2.5 AS d, 'ab' AS s, DATE '2024-01-05' AS dt, "
    "TIMESTAMP '2024-01-05 01:02:03.456' AS ts, ARRAY[1, 2] AS ai, "
    "ARRAY[1.0, 2.0] AS ad, MAP(ARRAY['k'], ARRAY[1]) AS m, "
    "approx_set('x') AS h "
    "UNION ALL "
    "SELECT 2, 3.5, 'ba', DATE '2024-02-05', "
    "TIMESTAMP '2024-02-05 01:02:03.456', ARRAY[2, 3], "
    "ARRAY[2.0, 3.0], MAP(ARRAY['k'], ARRAY[2]), approx_set('y')) probe_t")


def _probe(spark, sf_dir, sql):
    try:
        execute_trino(spark, sql, sf_dir).collect()
    except TrinoSqlUnsupported:
        pass   # named refusal — acceptable
    except Exception as ex:
        assert "UNRESOLVED_ROUTINE" not in str(ex), (
            f"front-end gap (bare unresolved routine): {sql}\n{ex}")


@pytest.mark.parametrize("expr", SURFACE, ids=lambda e: e[:40])
def test_scalar_surface(spark, sf_dir, expr):
    _probe(spark, sf_dir, f"SELECT {expr} AS x FROM {_FIXTURE}")


@pytest.mark.parametrize("expr", AGGREGATES, ids=lambda e: e[:40])
def test_aggregate_surface(spark, sf_dir, expr):
    _probe(spark, sf_dir, f"SELECT {expr} AS x FROM {_FIXTURE}")


@pytest.mark.parametrize("expr", WINDOWS, ids=lambda e: e[:40])
def test_window_surface(spark, sf_dir, expr):
    _probe(spark, sf_dir, f"SELECT {expr} AS x FROM {_FIXTURE}")
