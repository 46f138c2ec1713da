from prosearch_ray.functions import pretty_size, remove_scheme


def test_pretty_size_pg_semantics():
    assert pretty_size(0) == "0 bytes"
    assert pretty_size(512) == "512 bytes"
    assert pretty_size(10 * 1024 - 1) == "10239 bytes"
    assert pretty_size(10 * 1024) == "10 kB"
    assert pretty_size(123456789) == "118 MB"
    assert pretty_size(5 * 1024 ** 3) == "5120 MB"
    assert pretty_size(11 * 1024 ** 3) == "11 GB"


def test_remove_scheme():
    assert remove_scheme("https://example.com/a/b?q=1") == "example.com/a/b?q=1"
    assert remove_scheme("example.com/x") == "example.com/x"
