SELECT k.keyword AS keyword, COUNT(*) AS uses
FROM keyword k, movie_keyword mk, title t
WHERE t.production_year > 2000 AND k.id = mk.keyword_id AND t.id = mk.movie_id
GROUP BY k.keyword
HAVING COUNT(*) >= 2
ORDER BY uses DESC, keyword
LIMIT 15;
