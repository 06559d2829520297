SELECT COUNT(*) FROM posts as p, postLinks as pl, comments as c WHERE pl.PostId = p.Id AND c.PostId = p.Id AND p.Score>=6 AND p.AnswerCount>=1 AND p.CommentCount>=1 AND c.Score>=2;
