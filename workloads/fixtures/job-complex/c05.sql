SELECT t.title AS movie_title, t.production_year AS movie_year
FROM title t
WHERE EXISTS (SELECT 1 FROM movie_keyword mk, keyword k
              WHERE mk.movie_id = t.id AND mk.keyword_id = k.id
                AND k.keyword = 'sequel')
  AND t.production_year > 1995
ORDER BY movie_year, movie_title
LIMIT 20;
