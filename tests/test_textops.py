"""Text kernel tests (reference: semantic_strategy.py:239-269, 349-371;
web_utils.py:48-67)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_engine_spark.kernels import textops


def test_clean_text():
    assert textops.clean_text("  a\t\nb   c ") == "a b c"
    assert textops.clean_text("") == ""


def test_chunker_short_text_single_chunk():
    assert textops.create_content_chunks("short") == ["short"]


def test_chunker_sentence_boundary():
    text = ("A sentence that ends here. " * 200).strip()  # > 2000 chars
    chunks = textops.create_content_chunks(text)
    assert len(chunks) > 1
    # every chunk except possibly the last breaks right after a '.'
    for c in chunks[:-1]:
        assert c.endswith(".")
    # overlap: consecutive chunks share text
    assert chunks[0][-50:] in chunks[0]
    assert all(len(c) >= textops.MIN_CHUNK_SIZE for c in chunks)


def test_chunker_exact_reference_walk():
    """Replicate the reference algorithm independently and compare."""
    text = "x" * 1500 + ". " + "y" * 1500 + ". " + "z" * 1500

    def reference_chunks(t, max_c=2000, min_c=100, overlap=200):
        if len(t) <= max_c:
            return [t]
        out, start = [], 0
        while start < len(t):
            end = start + max_c
            if end < len(t):
                se = t.rfind(".", start, end)
                pe = t.rfind("\n", start, end)
                if se > start and se > pe:
                    end = se + 1
                elif pe > start:
                    end = pe + 1
            c = t[start:end].strip()
            if len(c) >= min_c:
                out.append(c)
            start = end - overlap
            if start >= len(t):
                break
        return out

    assert textops.create_content_chunks(text) == reference_chunks(text)


def test_keyword_relevance():
    assert textops.keyword_relevance("anything", None) == 0.5
    assert textops.keyword_relevance("spark crawl data", "spark crawl") == 1.0
    assert textops.keyword_relevance("spark only here", "spark crawl") == 0.5
    assert textops.keyword_relevance("nothing matches", "spark crawl") == 0.0


@given(st.text(min_size=0, max_size=5000))
@settings(max_examples=100, deadline=None)
def test_chunker_never_crashes_and_covers(text):
    chunks = textops.create_content_chunks(text)
    for c in chunks:
        assert len(c) >= textops.MIN_CHUNK_SIZE or len(chunks) == 1
