SELECT COUNT(*) FROM posts as p, postLinks as pl WHERE pl.PostId = p.Id AND p.ViewCount>=2308 AND p.AnswerCount=7 AND p.FavoriteCount<=40 AND p.CreationDate>='2013-07-16 04:32:48'::timestamp;
