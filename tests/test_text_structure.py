"""find_structure API (x-pack text-structure): format detection order,
delimiter candidates, header heuristics, mapping inference, timestamp
formats, field stats."""

import pytest

from elasticsearch_ray.ops.text_structure import (find_structure,
                                                  guess_mapping,
                                                  timestamp_format_of)


def test_ndjson_detected_first():
    sample = "\n".join('{"a": %d, "b": "x%d"}' % (i, i) for i in range(5))
    out = find_structure(sample)
    assert out["format"] == "ndjson"
    assert out["mappings"] == {"a": "long", "b": "keyword"}
    assert out["field_stats"]["a"]["count"] == 5
    assert out["field_stats"]["a"]["min_value"] == 0


def test_xml_detected():
    sample = "\n".join(
        f"<ev><id>{i}</id><who>u{i % 2}</who></ev>" for i in range(4))
    out = find_structure(sample)
    assert out["format"] == "xml"
    assert out["mappings"] == {"id": "long", "who": "keyword"}
    assert out["field_stats"]["who"]["cardinality"] == 2


def test_csv_with_header():
    sample = ("name,age,joined\n"
              "alice,34,2021-04-01T10:00:00Z\n"
              "bob,55,2022-05-02T11:30:00Z\n"
              "carol,19,2023-06-03T12:45:00Z\n")
    out = find_structure(sample)
    assert out["format"] == "delimited"
    assert out["delimiter"] == "," and out["has_header_row"] is True
    assert out["column_names"] == ["name", "age", "joined"]
    assert out["mappings"] == {"name": "keyword", "age": "long",
                               "joined": "date"}
    assert out["timestamp_field"] == "joined"
    assert out["java_timestamp_formats"] == ["ISO8601"]


def test_csv_headerless_numeric_rows():
    # all rows (incl. the first) look alike -> no header, columnN names
    sample = "\n".join(f"{i},{i * 2},{i * 3.5}" for i in range(1, 8))
    out = find_structure(sample)
    assert out["format"] == "delimited"
    assert out["has_header_row"] is False
    assert out["column_names"] == ["column1", "column2", "column3"]
    assert out["mappings"]["column3"] == "double"


def test_duplicate_first_row_values_mean_no_header():
    sample = "x,x,y\n1,2,3\n4,5,6\n7,8,9\n"
    out = find_structure(sample)
    assert out["has_header_row"] is False


def test_delimiter_candidate_order_and_min_columns():
    # semicolons need >= 4 columns (reference factory order); 3-column
    # semicolon rows without commas fall through to the log finder
    sample = "a;b;c\n1;2;3\n4;5;6\n"
    out = find_structure(sample)
    assert out["format"] == "semi_structured_text"
    sample4 = "a;b;c;d\n1;2;3;4\n5;6;7;8\n9;1;2;3\n"
    out = find_structure(sample4)
    assert out["format"] == "delimited" and out["delimiter"] == ";"
    # pipe needs >= 5 columns
    pipe = "\n".join("|".join(str(i * j) for j in range(5))
                     for i in range(1, 6))
    out = find_structure(pipe)
    assert out["format"] == "delimited" and out["delimiter"] == "|"


def test_semi_structured_log_with_timestamps():
    sample = ("2024-03-04T10:11:12Z ERROR something broke\n"
              "2024-03-04T10:11:13Z INFO recovered fine\n"
              "2024-03-04T10:11:14Z WARN watch out\n")
    out = find_structure(sample)
    assert out["format"] == "semi_structured_text"
    assert out["num_messages_analyzed"] == 3
    assert out["java_timestamp_formats"] == ["ISO8601"]
    assert out["grok_pattern"].startswith(".*?%{TIMESTAMP_ISO8601")
    assert out["sample_timestamp"] == "2024-03-04T10:11:12Z"


def test_mapping_inference_order():
    assert guess_mapping(["true", "FALSE", "True"]) == "boolean"
    assert guess_mapping(["1", "-2", "30"]) == "long"
    assert guess_mapping(["1.5", "2"]) == "double"
    assert guess_mapping(["2024-01-01 10:00:00,123"] * 2) == "date"
    assert guess_mapping(["abc", "def"]) == "keyword"
    assert guess_mapping(["x" * 300]) == "text"
    assert guess_mapping([]) == "keyword"


def test_timestamp_formats():
    assert timestamp_format_of("2024-01-02T03:04:05.123+01:00") == "ISO8601"
    assert timestamp_format_of("2024-01-02 03:04:05") == "ISO8601"
    assert timestamp_format_of("2024-01-02 03:04:05,999") \
        == "yyyy-MM-dd HH:mm:ss,SSS" or \
        timestamp_format_of("2024-01-02 03:04:05,999") == "ISO8601"
    assert timestamp_format_of("10/Oct/2000:13:55:36 -0700") \
        == "dd/MMM/yyyy:HH:mm:ss XX"
    assert timestamp_format_of("Mon Mar  4 10:11:12 2024") \
        == "EEE MMM dd HH:mm:ss yyyy"
    assert timestamp_format_of("1712345678") == "UNIX"
    assert timestamp_format_of("1712345678123") == "UNIX_MS"
    assert timestamp_format_of("not a time") is None


def test_field_stats_top_hits_ordering():
    sample = "\n".join('{"k": "%s"}' % v
                       for v in ["b", "a", "b", "c", "a", "b"])
    out = find_structure(sample)
    hits = out["field_stats"]["k"]["top_hits"]
    assert hits == [{"value": "b", "count": 3}, {"value": "a", "count": 2},
                    {"value": "c", "count": 1}]


def test_empty_sample_raises():
    with pytest.raises(ValueError):
        find_structure("   \n  \n")


def test_line_limit_respected():
    sample = "\n".join('{"a": 1}' for _ in range(50))
    out = find_structure(sample, line_limit=10)
    assert out["num_lines_analyzed"] == 10
    assert out["field_stats"]["a"]["count"] == 10


def test_heterogeneous_ndjson_keys_no_phantom_nan():
    # a key missing from some objects becomes pandas NaN — it must be
    # treated as absent, not the string 'nan'
    sample = ('{"ts": "2024-01-01T00:00:00", "v": 1}\n'
              '{"v": 3}\n'
              '{"ts": "2024-01-02T00:00:00", "v": 5}\n')
    out = find_structure(sample)
    assert out["mappings"]["ts"] == "date"
    assert out["timestamp_field"] == "ts"
    assert out["field_stats"]["ts"]["count"] == 2
    vals = {h["value"] for h in out["field_stats"]["ts"]["top_hits"]}
    assert "nan" not in vals
    # v arrives as float NaN-padded ints; values present are 1/3/5
    assert out["field_stats"]["v"]["count"] == 3
