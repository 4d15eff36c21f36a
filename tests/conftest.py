import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph import corpus
from linkgraph.extract import build_links
from linkgraph.graph import build_edges, build_vertices
from linkgraph.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "linkgraph-tests", cores=4, shuffle_partitions=8, driver_memory="4g"
    )
    yield s


class Bundle:
    """One corpus materialized every way the tests need it."""

    def __init__(self, spark, n_pages: int, seed: int = corpus.DEFAULT_SEED):
        self.n_pages = n_pages
        self.seed = seed
        self.rows, self.links_by_url = corpus.gen_corpus(seed, n_pages)
        self.pages = corpus.corpus_df(spark, seed, n_pages, num_partitions=4).persist()
        self.links = build_links(self.pages).persist()
        self.edges = build_edges(self.links).persist()
        self.vertices = build_vertices(self.pages, self.links).persist()
        self.url_of_id = {
            r["id"]: r["url"] for r in self.vertices.select("id", "url").collect()
        }
        self.id_of_url = {u: i for i, u in self.url_of_id.items()}

    def nx_digraph(self) -> "nx.DiGraph":
        g = nx.DiGraph()
        for r in self.rows:
            g.add_node(r.url)
        for src, dsts in self.links_by_url.items():
            for d in dsts:
                g.add_edge(src, d)
        return g

    def nx_digraph_ids(self) -> "nx.DiGraph":
        g = nx.DiGraph()
        for r in self.rows:
            g.add_node(self.id_of_url[r.url])
        for src, dsts in self.links_by_url.items():
            for d in dsts:
                g.add_edge(self.id_of_url[src], self.id_of_url[d])
        return g


@pytest.fixture(scope="session")
def tiny(spark):
    return Bundle(spark, corpus.TINY)


@pytest.fixture(scope="session")
def small(spark):
    return Bundle(spark, corpus.SMALL)


def collect_map(df, key, val):
    return {r[key]: r[val] for r in df.select(key, val).collect()}
