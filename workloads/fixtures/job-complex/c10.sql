SELECT t.title AS keyworded_movie, COUNT(DISTINCT mk.keyword_id) AS n_keywords
FROM title t, movie_keyword mk
WHERE t.id = mk.movie_id AND t.production_year > 2000
GROUP BY t.title
ORDER BY n_keywords DESC, keyworded_movie
LIMIT 12;
