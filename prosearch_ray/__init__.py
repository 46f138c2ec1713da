"""prosearch_ray — a Ray-Data-native inverted-index + BM25 search engine.

A from-scratch rebuild of the query/data-processing capabilities of
milindmantri/prosearch (Norconex crawler + tantivy index/serve; see SURVEY.md)
re-expressed as Ray Data pipelines:

- ``prosearch_ray.text``     tokenizer spec, language-ID, quality scoring,
                             fingerprinting (pure functions, shared by oracle
                             and engine).
- ``prosearch_ray.index``    fieldnorm quantization, posting codec, the
                             distributed index build pipeline, manifest/resume.
- ``prosearch_ray.query``    BM25 searcher + Ray actor-pool query stage.
- ``prosearch_ray.oracle``   brute-force single-process BM25 oracle.
- ``prosearch_ray.fixtures`` deterministic synthetic corpus / query generator.
- ``prosearch_ray.pipelines`` dedup, similarity search, text analysis, and
                             relational pipelines over the driver testdata.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()``; sessions are
owned by bench.py / CLI scripts / the pytest fixture.
"""

__version__ = "0.1.0"
