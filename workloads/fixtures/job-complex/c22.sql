SELECT k.keyword AS keyword, kt.kind AS movie_kind, COUNT(*) AS n
FROM keyword k, movie_keyword mk, title t, kind_type kt
WHERE k.keyword IN ('superhero','sequel','violence','murder','blood')
  AND k.id = mk.keyword_id AND t.id = mk.movie_id AND kt.id = t.kind_id
GROUP BY k.keyword, kt.kind
ORDER BY n DESC, keyword, movie_kind
LIMIT 20;
