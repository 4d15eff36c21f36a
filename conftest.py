# Repo-root conftest: puts /root/repo on sys.path so `import linkgraph`
# works without installation (pytest inserts this directory).
