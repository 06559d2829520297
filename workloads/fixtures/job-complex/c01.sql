SELECT t.production_year AS movie_year, COUNT(*) AS n_movies
FROM title t, movie_keyword mk, keyword k
WHERE k.keyword IN ('superhero','sequel','marvel-comics','based-on-comic','violence')
  AND t.production_year > 1990
  AND k.id = mk.keyword_id AND t.id = mk.movie_id
GROUP BY t.production_year
ORDER BY n_movies DESC, movie_year
LIMIT 10;
